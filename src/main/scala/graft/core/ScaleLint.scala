package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape guardrails for cluster scale — the checks this repo's specs
  * assert on individual operators, packaged as a user-facing API so a
  * pipeline author can gate THEIR composed chain before pointing it at
  * 100 TB. Inspection only: reads the compiled physical plan, runs
  * nothing.
  *
  * `error` findings are shapes that grow super-linearly with data size
  * (cartesian/nested-loop joins) or serialize the whole frame through one
  * task (unpartitioned window, global sort-without-limit below other
  * operators); `info` findings are structural facts (exchange count)
  * useful for before/after comparison when tuning.
  */
object ScaleLint {

  /** One lint finding. `severity` ∈ error | info. */
  final case class Finding(severity: String, rule: String, detail: String) {
    override def toString: String = s"[$severity] $rule: $detail"
  }

  /** Lint the frame's compiled PREPARED plan — post-EnsureRequirements,
    * pre-execution (AQE's runtime rewrites preserve or improve these
    * shapes, never introduce the flagged ones). The prepared plan carries
    * the requirement-driven exchanges, so the exchange count reflects the
    * shuffles the job will actually run, not only explicit repartitions.
    */
  def lint(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    val findings = Seq.newBuilder[Finding]

    plan.collect { case c: CartesianProductExec => c }.foreach { c =>
      findings += Finding("error", "cartesian-product",
        s"O(n*m) pair blow-up; add a join key, bucketize, or block: ${c.nodeName}")
    }
    plan.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      // a nested-loop whose broadcast side is PROVABLY bounded costs
      // O(n × k) with k fixed and small — a deliberate pattern in this
      // library (IVF centroid frames, tiny parameter tables, one-row
      // totals frames, bucket spines). Flag it info-level. Bounding
      // proofs, checked recursively (projections/filters/exchanges
      // preserve a bound; a join of bounded sides stays bounded):
      //  - a driver-local relation with ≤ 1024 rows
      //  - an UNGROUPED aggregate (exactly one row by construction)
      //  - a Range of ≤ 4096 elements (bucket/spine frames)
      val buildSide = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        case _ => j.left
      }
      def provesBounded(p: SparkPlan): Boolean = p match {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l.rows.size <= 1024
        case r: org.apache.spark.sql.execution.RangeExec =>
          r.numElements <= BigInt(4096)
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.isEmpty => true
        case other => other.children.nonEmpty && other.children.forall(provesBounded)
      }
      // a build side that is an AGGREGATED frame (one row per distinct
      // key) makes the nested loop domain-sized, not corpus-sized — the
      // margin/grid cross products of crossTable and driftByWindow, whose
      // output IS that product. Same posture as explode-join-fanout:
      // info, with a verify note (a near-unique grouping key would still
      // blow up).
      def provesAggregated(p: SparkPlan): Boolean = p match {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case other => other.children.nonEmpty && other.children.forall(provesAggregated)
      }
      if (provesBounded(buildSide))
        findings += Finding("info", "nested-loop-join-bounded",
          s"nested-loop against a bounded driver-local broadcast (${j.joinType}); " +
            "O(n x k) with k small and fixed — fine at scale, verify k stays bounded")
      else if (provesAggregated(buildSide))
        findings += Finding("info", "nested-loop-join-aggregated",
          s"nested-loop against an aggregated broadcast (${j.joinType}): one build " +
            "row per distinct grouping key, so the product is domain-sized — fine " +
            "for categorical domains (margins, reference profiles); verify the " +
            "grouping key is not near-unique")
      else
        findings += Finding("error", "nested-loop-join",
          "per-row scan of the broadcast side (non-equi condition); " +
            s"rewrite as an equi-join on a derived key (bucketized range, prefix): ${j.joinType}")
    }
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      // RANGE frames get their own rule: they usually arrive via a
      // time-keyed op (timeseriesAgg / rollingAgg / resample) called with
      // an EMPTY grouping, and the fix differs (add the entity key to the
      // grouping, or pre-bucket time) from the generic global-window cures
      val isRange = w.windowExpression.exists(e => e.collectFirst {
        case f: org.apache.spark.sql.catalyst.expressions.SpecifiedWindowFrame
          if f.frameType == org.apache.spark.sql.catalyst.expressions.RangeFrame => f
      }.nonEmpty)
      if (isRange)
        findings += Finding("error", "global-range-window",
          "RANGE-framed window with no PARTITION BY (a timeseriesAgg/rollingAgg/" +
            "resample-style op with an empty grouping) serializes every row " +
            "through ONE task; group by the entity key, or pre-aggregate to " +
            "coarse time buckets first")
      else
        findings += Finding("error", "global-window",
          "window with no PARTITION BY serializes every row through ONE task; " +
            "partition the window or use a distributed formulation (zipWithIndex, range ids)")
    }
    // explode feeding a join multiplies rows TWICE (per-row fan-out, then
    // match rate) — legitimate in bounded shapes (the bucketized range
    // join explodes each interval to its covered buckets by design), a
    // blow-up when the generator is unbounded. Info-level: verify the
    // fan-out bound.
    plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.children.exists(_.collectFirst {
          case g: org.apache.spark.sql.execution.GenerateExec => g
        }.nonEmpty) => j
    }.foreach { j =>
      findings += Finding("info", "explode-join-fanout",
        s"a row-generating explode feeds ${j.nodeName}: output rows multiply " +
          "(per-row fan-out x match rate); confirm the generator is bounded " +
          "(fixed-width buckets, capped arrays) before running at corpus scale")
    }
    // a global sort directly under collect/write is a legitimate ordered
    // output; a global sort BELOW other operators re-materializes the
    // whole frame range-partitioned — flag only the buried ones
    def buriedGlobalSort(p: SparkPlan, depth: Int): Unit = p match {
      case s: org.apache.spark.sql.execution.SortExec if s.global && depth > 1 =>
        findings += Finding("error", "buried-global-sort",
          "global sort feeding further operators range-partitions the full frame; " +
            "sort only at the sink, or sortWithinPartitions")
      case other => other.children.foreach(buriedGlobalSort(_, depth + 1))
    }
    buriedGlobalSort(plan, 0)

    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }.size
    findings += Finding("info", "exchange-count", s"$exchanges shuffle exchange(s) in the plan")
    findings.result()
  }

  /** Throw (listing every error finding) if the plan contains a
    * scale-unsafe shape; return the error-free findings otherwise.
    */
  def assertSafe(df: DataFrame): Seq[Finding] = {
    val fs = lint(df)
    val errs = fs.filter(_.severity == "error")
    if (errs.nonEmpty)
      throw new IllegalStateException(
        s"scale-unsafe plan shapes:\n${errs.mkString("\n")}")
    fs
  }
}
