package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.streaming.EventStreams
import TestSpark._

/** Gates for the round-11 preflight/window-census batch: the join-
  * cardinality profiler (exact inner-join output size + hottest keys —
  * the audit to run before a 100 TB join) and the per-window frequent-
  * items census (heavyHittersByWindow — one mergeable sketch per window
  * instead of the full (window × value) count shuffle). Exact-regime
  * assertions are equalities; the sketch's approximate regime is covered
  * by the Round11Batch2Spec contract tests on the shared kernel.
  */
class Round11Batch5Spec extends AnyFunSuite {
  import spark.implicits._

  test("join_cardinality_profile: hand-verified counts, contrib, totals") {
    // left: key 1 x3, 2 x1, 3 x2, null x1 -> rows_a=6, keys_a=3, max=3
    // right: key 1 x2, 4 x5, null x2     -> rows_b=7, keys_b=2, max=5
    // matched: only key 1 -> contrib 3*2=6, est_rows 6.0
    val l = Seq(Some(1), Some(1), Some(1), Some(2), Some(3), Some(3), None)
      .toDF("lk")
    val r = Seq(Some(1), Some(1), Some(4), Some(4), Some(4), Some(4), Some(4),
      None, None).toDF("rk")
    val out = Chain(spark, "jl", l)
      .joinCardinalityProfile(Chain(spark, "jr", r), Seq("lk" -> "rk"))
    val rows0 = out.df.collect()
    assert(rows0.length == 1)
    val x = rows0(0)
    assert(x.getInt(0) == 1 && x.getLong(1) == 3 && x.getLong(2) == 2 &&
      x.getDouble(3) == 6.0, "matched key 1: cnt_a=3, cnt_b=2, contrib=6")
    assert(x.getLong(4) == 6 && x.getLong(5) == 7, "valid rows exclude null keys")
    assert(x.getLong(6) == 3 && x.getLong(7) == 2, "distinct key counts")
    assert(x.getLong(8) == 1, "keys_matched")
    assert(x.getLong(9) == 3 && x.getLong(10) == 5, "max multiplicities")
    assert(x.getDouble(11) == 6.0, "est_rows = exact inner-join size")
    out.assertScaleSafe()
  }

  test("join_cardinality_profile: top_k order by contrib desc then key asc") {
    // contribs: key 1 -> 2*2=4, key 2 -> 4*1=4 (tie, key asc), key 3 -> 1*6=6
    val l = Seq(1, 1, 2, 2, 2, 2, 3).toDF("k")
    val r = (Seq(1, 1, 2) ++ Seq.fill(6)(3)).toDF("k")
    val got = Chain(spark, "jl2", l)
      .joinCardinalityProfile(Chain(spark, "jr2", r), Seq("k" -> "k"), topK = 2)
      .df.collect().map(x => (x.getInt(0), x.getDouble(3))).toSeq
    assert(got == Seq((3, 6.0), (1, 4.0)), s"got $got")
  }

  test("join_cardinality_profile fuzz: est_rows equals the literal inner-join size") {
    val rnd = new scala.util.Random(42)
    val l = Seq.fill(300)(rnd.nextInt(40)).toDF("k")
    val r = Seq.fill(200)(rnd.nextInt(60)).toDF("k")
    val prof = Chain(spark, "fl", l)
      .joinCardinalityProfile(Chain(spark, "fr", r), Seq("k" -> "k"), topK = 1)
      .df.collect()
    val actual = l.join(r.withColumnRenamed("k", "k2"), col("k") === col("k2")).count()
    assert(prof.length == 1 && prof(0).getDouble(11) == actual.toDouble,
      s"est_rows ${prof.headOption.map(_.getDouble(11))} vs actual join $actual")
  }

  test("join_cardinality_profile: disjoint keys yield an empty frame") {
    val l = Seq(1, 2).toDF("k")
    val r = Seq(3, 4).toDF("k")
    assert(Chain(spark, "jl3", l)
      .joinCardinalityProfile(Chain(spark, "jr3", r), Seq("k" -> "k")).df.isEmpty)
  }

  private val base = 1704067200L * 1000000000L
  private def evt(id: Long, minute: Long, user: Long) =
    Evt(id, base + minute * 60L * 1000000000L, user, "e", 1.0, "{}")

  test("heavy_hitters_by_window: per-window top-k, tie-break by item asc") {
    // hour 0: user 7 x3, user 10 x2, user 2 x2 -> k=2 keeps 7 then "10"
    // ("10" < "2" as strings — the deterministic readout order); hour 1:
    // single user
    val df = (Seq.fill(3)(7L) ++ Seq.fill(2)(10L) ++ Seq.fill(2)(2L))
      .zipWithIndex.map { case (u, i) => evt(i, i.toLong, u) }
      .++(Seq(evt(90, 70, 5))).toDF()
    val got = EventStreams.heavyHittersByWindow(df, "user_id", "1 hour", k = 2)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).getHour, r.getInt(3)) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(got((0, 1)) == (("7", 3L)))
    assert(got((0, 2)) == (("10", 2L)), "tie 2-vs-2 breaks by item string asc")
    assert(got((1, 1)) == (("5", 1L)))
    assert(got.size == 3)
    // grouped face: keys partition the census like quantilesByWindow
    val df2 = Seq(evt(1, 0, 7), evt(2, 1, 7), evt(3, 2, 9))
      .map(e => e.copy(event_type = if (e.event_id == 3) "b" else "a")).toDF()
    val byKey = EventStreams.heavyHittersByWindow(df2, "user_id", "1 hour",
      k = 2, keys = Seq("event_type")).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(byKey == Map(("a", "7") -> 2L, ("b", "9") -> 1L))
  }

  test("psi_quantile_profile: hand-verified quartile bins, bounds, zero drift") {
    // base 1..8: inclusive-rank cutoffs at .25/.5/.75 are 2, 4, 6;
    // bucket = #cutoffs strictly below x -> perfect quarters {1,2} {3,4}
    // {5,6} {7,8}; identical other side -> every term 0, psi_total 0;
    // a NaN row changes nothing
    val base = (1 to 8).map(_.toDouble).toDF("x")
    val other = ((1 to 8).map(_.toDouble) :+ Double.NaN).toDF("x")
    val out = Chain(spark, "pq0", base).psiQuantileProfile(other, "x", 4, k = 64)
    val got = out.df.collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 4)
    (0L to 3L).foreach { b =>
      assert(got(b).getLong(3) == 2L && got(b).getLong(4) == 2L, s"bucket $b counts")
      assert(got(b).getDouble(5) == 0.0, "identical sides: zero term")
      assert(got(b).getDouble(6) == 0.0, "zero psi_total")
    }
    assert(got(0L).isNullAt(1) && got(0L).getDouble(2) == 2.0, "open low end")
    assert(got(3L).getDouble(1) == 6.0 && got(3L).isNullAt(2), "open high end")
    assert(got(1L).getDouble(1) == 2.0 && got(1L).getDouble(2) == 4.0)
  }

  test("psi_quantile_profile: concentration drift is visible; empty base reads null") {
    // other mass all above the base's p75 -> bucket 3 holds everything
    val base = (1 to 8).map(_.toDouble).toDF("x")
    val other = Seq(7.0, 8.0, 9.0, 10.0).toDF("x")
    val got = Chain(spark, "pq1", base).psiQuantileProfile(other, "x", 4, k = 64)
      .df.collect().map(r => r.getLong(0) -> r).toMap
    assert(got(3L).getLong(4) == 4L && got(0L).getLong(4) == 0L)
    assert(got(0L).getDouble(6) > 1.0, "all-mass-moved must read as large PSI")
    // empty base: null cutoffs, zero base mass -> null terms and total,
    // never a fake zero or an ANSI abort
    val eb = Chain(spark, "pq2", spark.emptyDataset[Double].toDF("x"))
      .psiQuantileProfile(other, "x", 4, k = 64).df.collect()
    assert(eb.length == 4 && eb.forall(r => r.isNullAt(5) && r.isNullAt(6)))
  }

  private def evtV(id: Long, minute: Long, v: Double) =
    Evt(id, base + minute * 60L * 1000000000L, 1L, "e", v, "{}")

  test("drift_by_window_quantile: identical window reads 0, shifted window reads large") {
    // reference 1..8 -> quartile cutoffs 2, 4, 6 (2 per bin); hour 0
    // samples the same distribution (psi 0 per construction), hour 1 puts
    // all mass above p75 (bucket 3)
    val ref = (1 to 8).map(i => evtV(100 + i, 0, i.toDouble)).toDF()
    val ev = ((1 to 8).map(i => evtV(i, i.toLong, i.toDouble)) ++
      Seq(evtV(20, 70, 7.0), evtV(21, 75, 9.0), evtV(22, 80, 30.0))).toDF()
    val got = EventStreams.driftByWindowQuantile(ev, ref, "value", "1 hour", 4, k = 64)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).getHour, r.getLong(1)) -> r).toMap
    assert(got.size == 8, "2 windows x 4 spine buckets")
    (0L to 3L).foreach { b =>
      assert(got((0, b)).getLong(4) == 2L && got((0, b)).getLong(5) == 2L)
      assert(got((0, b)).getDouble(7) == 0.0, "identical shares: psi_total 0")
    }
    assert(got((1, 3L)).getLong(5) == 3L && got((1, 0L)).getLong(5) == 0L,
      "hour 1: all mass above the reference p75")
    assert(got((1, 0L)).getDouble(7) > 1.0, "moved mass must read as large PSI")
    assert(got((0, 0L)).isNullAt(2) && got((0, 0L)).getDouble(3) == 2.0,
      "open low end carries null cut_lo")
    assert(got((0, 3L)).getDouble(2) == 6.0 && got((0, 3L)).isNullAt(3))
  }

  test("streaming cohort retention: upsert-activity composition converges under late data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS cohort_acts_t")
    val day = 24 * 60L
    // batch 1: user 1 active day 1 and day 2; user 2 active day 0
    // batch 2 delivers LATE data — user 1's day-0 activity — which moves
    // user 1's cohort from day 1 to day 0; the closer re-derives cohorts
    // from the complete stored activity, so the grid converges exactly
    val b1 = Seq(evt(1, day, 1), evt(2, day + 5, 1), evt(3, 2 * day, 1), evt(4, 10, 2))
    val b2 = Seq(evt(5, 20, 1))
    def drain(events: Seq[Evt]): Unit = {
      val ms = MemoryStream[Evt]
      ms.addData(events: _*)
      val acts = ms.toDF().select(col("user_id"),
        to_date(EventStreams.eventTime(ms.toDF())).as("d"))
      EventStreams.sinkUpsertToTable(acts, "cohort_acts_t", Seq("user_id", "d"),
        java.nio.file.Files.createTempDirectory("graft_ckpt_coh").toString)
    }
    drain(b1)
    drain(b2)
    val got = rows(EventStreams.cohortRetention(
      spark.table("cohort_acts_t"), "user_id", "d"))
    val want = rows(EventStreams.cohortRetention((b1 ++ b2).toDF()))
    assert(got == want, "stored-activity closer must equal the all-events batch face")
    // and the late row really moved the cohort: both users now cohort day 0
    val day0 = EventStreams.cohortRetention(spark.table("cohort_acts_t"), "user_id", "d")
      .where(col("period") === 0).collect()
    assert(day0.length == 1 && day0(0).getLong(3) == 2L,
      s"late data must merge both users into the day-0 cohort, got ${day0.toSeq}")
  }

  test("ScaleLint: a spine-join-on-grouping-key build proves bounded (no NLJ error)") {
    // Range spine LEFT JOIN an aggregate grouped by the join key: output
    // is ≤ spine rows by construction, so crossing it onto a corpus is a
    // bounded nested loop — the prover must see through the join instead
    // of erroring (the shape that forced driftByWindowQuantile's grid
    // restructure, now provable directly)
    // the corpus must be a file scan — a Range corpus would itself prove
    // bounded and mask the join-proof path under test
    val corpus = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id AS id", "event_id % 7 AS b")
    val counts = corpus.groupBy(col("b")).agg(count(lit(1)).as("c"))
    val spineJoined = spark.range(7).select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("c"), lit(0L)).as("c"))
    val crossed = corpus.crossJoin(broadcast(spineJoined))
    val fs = graft.core.ScaleLint.lint(crossed)
    assert(!fs.exists(_.severity == "error"),
      s"bounded spine-join build must not error: ${fs.mkString("; ")}")
    assert(fs.exists(f => f.rule == "nested-loop-join-bounded"),
      s"expected the bounded-NLJ info finding, got: ${fs.mkString("; ")}")
    // the proof must NOT fire for a right/full outer spine join (unmatched
    // corpus-side rows would flow through unbounded)
    val outer = spark.range(7).select(col("id").as("b"))
      .join(counts, Seq("b"), "full_outer")
      .select(col("b"), coalesce(col("c"), lit(0L)).as("c"))
    val fs2 = graft.core.ScaleLint.lint(corpus.crossJoin(broadcast(outer)))
    assert(!fs2.exists(_.rule == "nested-loop-join-bounded"),
      s"full-outer spine join must not prove bounded: ${fs2.mkString("; ")}")
  }

  test("heavy_hitters_by_window: empty input -> empty frame, scale shape safe") {
    val empty = spark.emptyDataset[Evt].toDF()
    assert(EventStreams.heavyHittersByWindow(empty, "user_id", "1 hour", 3).isEmpty)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    graft.core.ScaleLint.assertSafe(
      EventStreams.heavyHittersByWindow(ev, "user_id", "1 hour", 5))
    graft.core.ScaleLint.assertSafe(
      Chain(spark, "li", spark.read.parquet(s"$sfDir/lineitem.parquet"))
        .joinCardinalityProfile(
          Chain(spark, "or", spark.read.parquet(s"$sfDir/orders.parquet")),
          Seq("l_orderkey" -> "o_orderkey")).df)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    Chain(spark, "lib", li.where("l_suppkey % 2 = 0"))
      .psiQuantileProfile(li.where("l_suppkey % 2 = 1"), "l_extendedprice", 8)
      .assertScaleSafe()
    graft.core.ScaleLint.assertSafe(EventStreams.driftByWindowQuantile(
      ev, ev.where("event_id % 50 = 0"), "value", "1 hour", 4))
  }
}
