package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-17 OPTIMIZATION batch — every change here must keep
  * results bit-identical while cutting plan cost, so each test pins
  * value-equality between the old and new formulations plus the plan
  * shape the optimization claims:
  *
  *  - iterative loops (clusterPairs / contraction / linkRank / mmrRerank)
  *    broadcast-hint their per-round small frames from a MEASURED count
  *    the loop already pays for ([[graft.ext.DedupOps.maybeBroadcastSmall]]);
  *  - searchTfidf prunes corpus postings to probed terms behind the
  *    [[graft.core.SizeGate]] gate (the searchTfidfIndex shape);
  *  - tfidf's corpus-size N rides as a broadcast one-row aggregate
  *    (no chain-build driver job), render face deferred via nextLazy;
  *  - globalTieRanks broadcast-hints its distinct-value rank table and
  *    derives the non-null count from the materialized scan, not a third
  *    corpus pass;
  *  - ScaleLint: GlobalLimitExec's -1 "offset-only" sentinel no longer
  *    reads as a bound, and `k <=> true` boolean key pins bound again.
  */
class Round17Spec extends AnyFunSuite {
  import spark.implicits._

  private def bhjCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => n += 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  // ---- iterative-loop broadcast gating --------------------------------

  test("clusterPairs on a deep chain: same labels as before, rounds converge") {
    // a 40-node chain — the adversarial deep-component shape (round-17:
    // the 0.4-threshold embedding fixture is such a chain) — plus a
    // shallow star, mixed; labels must equal the component minimum
    val chain = (1L until 30L).map(i => (i, i + 1))
    val star = Seq((100L, 101L), (100L, 102L), (100L, 103L))
    val pairs = Chain(spark, "p", (chain ++ star).toDF("id_a", "id_b"))
    val got = pairs.clusterPairs().df
    val labels = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 30L).foreach(i => assert(labels(i) == 1L, s"chain node $i"))
    Seq(100L, 101L, 102L, 103L).foreach(i => assert(labels(i) == 100L, s"star node $i"))
    Chain.releaseCheckpoints(got)
  }

  test("linkRank: broadcast-gated sweeps equal the ungated (shuffle) sweeps") {
    val edges = Chain(spark, "e",
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 1L)).toDF("s", "t"))
    val gated = edges.linkRank("s", "t", iterations = 3).df.collect()
      .map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.iterBroadcast.maxRows", "0")
    val ungated =
      try Chain(spark, "e", Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 1L))
        .toDF("s", "t")).linkRank("s", "t", iterations = 3).df.collect()
        .map(_.toString).sorted.toSeq
      finally spark.conf.unset("spark.graft.iterBroadcast.maxRows")
    assert(gated == ungated,
      "the broadcast hint is a physical choice — fixed-point ranks must be identical")
  }

  test("clusterPairsContraction: gated equals ungated on a chain + star mix") {
    def run(): Seq[String] = {
      val pairs = Chain(spark, "p",
        ((1L until 12L).map(i => (i, i + 1)) ++ Seq((50L, 51L), (50L, 52L)))
          .toDF("id_a", "id_b"))
      val got = pairs.clusterPairsContraction().df
      val out = got.collect().map(_.toString).sorted.toSeq
      Chain.releaseCheckpoints(got)
      out
    }
    val gated = run()
    spark.conf.set("spark.graft.iterBroadcast.maxRows", "0")
    val ungated = try run()
      finally spark.conf.unset("spark.graft.iterBroadcast.maxRows")
    assert(gated == ungated)
  }

  // ---- searchTfidf probe pruning --------------------------------------

  test("searchTfidf: pruned face equals the unpruned face exactly; plan prunes postings") {
    val docs = table("documents")
    val queries = table("documents").filterRows(Seq("doc_id < 3"))
    val pruned = docs.searchTfidf(queries, "doc_id", "text", "doc_id", "text", k = 5)
    // gate CLOSED → the original full-tfidf join plan (the 100 TB batch
    // posture); values must be identical either way
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.probeBroadcast.maxBytes", "0")
    val full =
      try docs.searchTfidf(queries, "doc_id", "text", "doc_id", "text", k = 5)
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        spark.conf.unset("spark.graft.probeBroadcast.maxBytes")
      }
    assert(rows(pruned.df) == rows(full.df),
      "posting pruning must not change a single score or rank")
    // the pruned plan semi-joins the corpus token stream against the
    // broadcast query-term list BEFORE the tf aggregation
    val semi = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      var found = false
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => found = true
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case _ => ()
        }
        p.children.foreach(walk)
      }
      walk(pruned.df.queryExecution.executedPlan)
      found
    }
    assert(semi, "expected a broadcast LeftSemi posting-pruning join in the pruned plan")
    // both log-idf faces agree too (the transcendental scoring path)
    val prunedLog = docs.searchTfidf(queries, "doc_id", "text", "doc_id", "text",
      k = 5, idf = "log")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.probeBroadcast.maxBytes", "0")
    val fullLog =
      try docs.searchTfidf(queries, "doc_id", "text", "doc_id", "text",
        k = 5, idf = "log")
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        spark.conf.unset("spark.graft.probeBroadcast.maxBytes")
      }
    assert(rows(prunedLog.df) == rows(fullLog.df))
  }

  test("tfidf: no chain-build driver job; N rides as a broadcast one-row aggregate") {
    // chain construction must not run a Spark job any more (the old shape
    // collected countDistinct eagerly) — pin via a listener. Jobs are
    // counted ONLY within this test's job group (round 18, ADVICE: the
    // old global onJobStart counter failed spuriously under any
    // concurrently running suite's jobs)
    val group = "r17-tfidf-construction-pin"
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.properties != null &&
          group == j.properties.getProperty("spark.jobGroup.id"))
          counter.incrementAndGet()
    }
    val docs = table("documents") // parquet footer read happens here, not in tfidf
    docs.df.count() // warm the scan so no lazy file-listing job is misattributed
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(group, group)
    try {
      val ch = docs.tfidf("doc_id", "text")
      Thread.sleep(1000)
      assert(counter.get == 0,
        s"tfidf chain construction ran ${counter.get} Spark job(s); N must ride the plan")
      // and the render face still bakes N as a literal at render time
      val sql = ch.sql()
      assert(sql.contains("CAST(tf * "), s"render must bake N: $sql")
      assert(rows(spark.sql(sql)) == rows(ch.df))
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  // ---- globalTieRanks -------------------------------------------------

  test("quantileNormalize ungrouped: rank-table broadcast fires and values are unchanged") {
    val orders = table("orders")
    val qn = orders.quantileNormalize("o_totalprice")
    // distinct-value rank table + reference CDF table both broadcast on
    // this small corpus — the corpus itself never shuffles on the value
    qn.df.count()
    assert(bhjCount(qn.df) >= 2,
      "expected the rank table and reference table joins to be broadcast")
    // equivalence vs the single-constant-group window face (the Round16
    // pattern): a constant group forces the window formulation down the
    // grouped path
    val winFace = orders.transformDf("const")(_.withColumn("_g", lit(1)))
      .quantileNormalize("o_totalprice", groupBy = Seq("_g"))
      .dropColumns(includeCols = orders.df.columns.toSeq :+ "o_totalprice_qnorm")
    assert(rows(qn.df) == rows(winFace.df))
    Chain.releaseCheckpoints(qn.df)
    Chain.releaseCheckpoints(winFace.df)
  }

  // ---- ScaleLint fixes ------------------------------------------------

  test("lint: offset-only GlobalLimit (-1 sentinel) does not prove a bounded build side") {
    // construct the sentinel directly: Dataset.offset plans
    // GlobalLimitExec(limit = -1, child, offset)
    val base = spark.range(10000).toDF("id")
    // Dataset.offset plans GlobalLimitExec(limit = -1, child, offset) in
    // the build side; before the fix that sentinel read as "bounded
    // <= 4096" and silenced the nested-loop error to an info finding
    val off = base.offset(5)
    val lintFindings = graft.core.ScaleLint.lint(
      base.crossJoin(off.select(col("id").as("id2"))))
    assert(lintFindings.exists(f =>
      f.severity == "error" &&
        (f.rule == "nested-loop-join" || f.rule == "cartesian-product")),
      s"offset-only build side must still lint as a nested-loop hazard: $lintFindings")
  }

}
