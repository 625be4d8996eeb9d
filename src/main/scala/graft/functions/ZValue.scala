package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order curve value for [[graft.core.Chain.saveZOrdered]]: each (double)
  * child maps to a `bits`-bit quantile bin by binary search over its
  * driver-computed cut points, and the bins bit-interleave into one long —
  * bit `b` of column `i` lands at position `b·nCols + i`, so sorting by the
  * result clusters rows that are close in EVERY dimension (the Morton
  * curve over equal-mass cells; quantile cuts make the cells skew-robust
  * where equal-width cells would collapse under heavy-tailed columns).
  *
  * NULL values bin to 0, and so do NaN values (every `cut <= NaN`
  * comparison is false, so the binary search never advances): both
  * cluster together at the curve's origin, so null/NaN-filtering scans
  * skip cleanly and a corrupt key can never skew a data-bearing cell.
  * The cut points themselves are derived NaN-free (saveZOrdered nulls
  * NaN before the quantile job — one NaN cut would poison the search
  * for every row). One tight codegen loop per row; the cut arrays ride
  * along as referenced objects, not literals.
  */
case class ZValue(children: Seq[Expression], cuts: Seq[Array[Double]], bits: Int)
    extends Expression {

  require(children.nonEmpty, "zvalue needs at least one column")
  require(children.size == cuts.size, "one cut-point array per column")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits ($bits) x columns (${children.size}) must fit in a long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double inputs, got ${children.map(_.dataType.simpleString).mkString(", ")}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zvalue"

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      val bin =
        if (v == null) 0
        else ZValue.binOf(cuts(i), v.asInstanceOf[Double], bits)
      var b = 0
      while (b < bits) {
        z |= ((bin >> b) & 1L) << (b * n + i)
        b += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val n = children.size
    val z = ctx.freshName("z")
    val cutsRefs = cuts.map(c => ctx.addReferenceObj("zcuts", c, "double[]"))
    val childGen = children.map(_.genCode(ctx))
    val perChild = childGen.zipWithIndex.map { case (cg, i) =>
      val bin = ctx.freshName("bin")
      val b = ctx.freshName("b")
      s"""
         |${cg.code}
         |long $bin = ${cg.isNull} ? 0L :
         |  graft.functions.ZValue.binOf(${cutsRefs(i)}, ${cg.value}, $bits);
         |for (int $b = 0; $b < $bits; $b++) {
         |  $z |= (($bin >> $b) & 1L) << ($b * $n + $i);
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code =
        code"""
           |long $z = 0L;
           |$perChild
           |final long ${ev.value} = $z;
         """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZValue {
  /** Quantile bin of `v` against ascending `cuts` (length 2^bits − 1):
    * the count of cut points strictly below-or-equal, via binary search —
    * shared by interpreted eval and generated code.
    */
  def binOf(cuts: Array[Double], v: Double, bits: Int): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    val max = (1L << bits) - 1L
    if (lo > max) max else lo.toLong
  }

  def apply(columns: Seq[Column], cuts: Seq[Array[Double]], bits: Int): Column =
    GraftBridge.column(new ZValue(columns.map(GraftBridge.expression), cuts, bits))
}
