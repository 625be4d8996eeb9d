package graft

import graft.core.Chain

/** Implicit operator surface: `import graft.ops._` puts all 46 reference
  * transforms (SURVEY §2.2) on [[graft.core.Chain]] as extension methods —
  * the Scala-static equivalent of the reference's dynamic per-template
  * method attachment (rasgoql/primitives/transforms.py:55-77).
  */
package object ops {
  import scala.language.implicitConversions
  implicit def toProjectOps(c: Chain): ProjectOps = new ProjectOps(c)
  implicit def toFilterOps(c: Chain): FilterOps = new FilterOps(c)
  implicit def toJoinOps(c: Chain): JoinOps = new JoinOps(c)
  implicit def toAggOps(c: Chain): AggOps = new AggOps(c)
  implicit def toWindowOps(c: Chain): WindowOps = new WindowOps(c)
  implicit def toDateOps(c: Chain): DateOps = new DateOps(c)
  implicit def toEncodeOps(c: Chain): EncodeOps = new EncodeOps(c)
  implicit def toReshapeOps(c: Chain): ReshapeOps = new ReshapeOps(c)
}
