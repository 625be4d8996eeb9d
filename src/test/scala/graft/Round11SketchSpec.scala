package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.streaming.EventStreams
import TestSpark._

/** Gates for the round-11 KLL scale twins of the two exact order-statistic
  * profiles (trimmedMeanSketch / quantileProfileSketch) and the numeric
  * windowed-drift face. The sketch twins must track their exact faces
  * within the sketch's normalized rank error, keep the same output
  * contract on edge inputs, and carry the scale shape the exact faces
  * lack (no window sort keyed by a low-domain key). KLL compaction is
  * randomized, so the gates are rank bands, never hashes (the
  * QuantGateSpec posture); bit-exact assertions are confined to the exact
  * regime (n <= k: the sketch retains every value) and to trim = 0 (the
  * cutoffs are the retained exact min/max at any n).
  */
class Round11SketchSpec extends AnyFunSuite {
  import spark.implicits._

  // 3x the k=200 normalized rank error (~1.65%), the QuantGateSpec margin
  private val eps = 0.05

  // inclusive-rank order statistic over a sorted array: smallest value
  // whose (1-based rank)/n >= p — the KLL INCLUSIVE convention
  private def qv(arr: Array[Double], p: Double): Double =
    arr(math.max(0, math.min(arr.length - 1, math.ceil(p * arr.length).toInt - 1)))

  test("trimmed_mean_sketch tracks the exact face inside the KLL rank band") {
    val li = table("lineitem")
    val trim = 0.1
    val exact = li.trimmedMean("l_extendedprice", trim, Seq("l_returnflag")).df
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sk = li.trimmedMeanSketch("l_extendedprice", trim, Seq("l_returnflag")).df
      .collect().map(r =>
        r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sk.keySet == exact.keySet)
    val vals = li.df
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    def meanIn(arr: Array[Double], lo: Double, hi: Double): Double = {
      val kept = arr.filter(v => v >= lo && v <= hi)
      kept.sum / kept.length
    }
    vals.foreach { case (flag, arr) =>
      val (got, nKept, n) = sk(flag)
      assert(n == arr.length.toLong, s"$flag: n must be the exact valid count")
      // corner bound: each sketch cutoff sits within +-eps rank of its
      // exact order statistic, and the mean over [lo, hi] is monotone in
      // each endpoint, so the sketch mean lies between the means over the
      // two extreme cutoff placements
      val cLo = meanIn(arr, qv(arr, trim - eps), qv(arr, 1 - trim - eps))
      val cHi = meanIn(arr, qv(arr, trim + eps), qv(arr, 1 - trim + eps))
      assert(got >= math.min(cLo, cHi) - 1e-9 && got <= math.max(cLo, cHi) + 1e-9,
        f"$flag: sketch tmean $got%.2f outside corner band [$cLo%.2f, $cHi%.2f]")
      // kept share within the rank-error band of 1 - 2*trim
      val share = nKept.toDouble / n
      assert(share >= 1 - 2 * (trim + eps) - 0.01 &&
        share <= 1 - 2 * (trim - eps) + 0.01,
        f"$flag: kept share $share%.3f outside the trim band")
      val e = exact(flag)
      assert(math.abs(got - e) / math.abs(e) <= 0.05,
        f"$flag: sketch $got%.2f vs exact $e%.2f beyond 5%%")
    }
  }

  test("trimmed_mean_sketch: trim=0 equals the exact face bit-for-bit") {
    // q(0)/q(1) are the sketch's retained exact min/max, so every valid
    // value is kept and both faces close with the same exact-decimal mean
    val li = table("lineitem")
    val e = li.trimmedMean("l_extendedprice", 0.0, Seq("l_returnflag"))
    val s = li.trimmedMeanSketch("l_extendedprice", 0.0, Seq("l_returnflag"))
    assert(rows(s.df) == rows(e.df))
  }

  test("trimmed_mean_sketch contract edges: empty frame, all-NaN group") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("g STRING, x DOUBLE"))
    val e0 = Chain(spark, "tm0", empty).trimmedMeanSketch("x", 0.1).df.collect()
    assert(e0.length == 1 && e0(0).isNullAt(0) &&
      e0(0).getLong(1) == 0 && e0(0).getLong(2) == 0,
      "ungrouped empty frame -> one null-mean row with zero counts")
    val df = Seq(("a", Double.NaN), ("a", Double.NaN),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "x")
    val got = Chain(spark, "tm1", df).trimmedMeanSketch("x", 0.1, Seq("g")).df
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("a") == ((None, 0L, 0L)), "all-NaN group -> null mean, zero counts")
    assert(got("b")._1.contains(2.0) && got("b")._3 == 3L)
  }

  test("quantile_profile_sketch values sit in exact rank bands; n exact") {
    val li = table("lineitem")
    val probs = Seq(0.25, 0.5, 0.95)
    val cols2 = Seq("l_quantity", "l_extendedprice")
    val sk = li.quantileProfileSketch(cols2, probs, Seq("l_returnflag")).df
      .collect().map(r => ((r.getString(0), r.getString(1), r.getDouble(2)),
        (r.getDouble(3), r.getLong(4)))).toMap
    val arrs: Map[(String, String), Array[Double]] = cols2.flatMap { cn =>
      li.df.select(col("l_returnflag"), col(cn).cast("double")).collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => (k, cn) -> rs.map(_.getDouble(1)).sorted }
    }.toMap
    assert(sk.keySet.map(k => (k._1, k._2)) == arrs.keySet)
    sk.foreach { case ((flag, cn, p), (v, n)) =>
      val arr = arrs((flag, cn))
      assert(n == arr.length.toLong, s"($flag, $cn): n must be exact")
      val (lo, hi) = (qv(arr, math.max(0.0, p - eps)), qv(arr, math.min(1.0, p + eps)))
      assert(v >= lo && v <= hi,
        f"($flag, $cn, p=$p) sketch $v%.2f outside exact rank band [$lo%.2f, $hi%.2f]")
    }
  }

  test("quantile_profile_sketch drops empty columns like the exact face") {
    val df = Seq((1.0, Option.empty[Double]), (2.0, None), (3.0, None)).toDF("a", "b")
    val c = Chain(spark, "qps0", df).quantileProfileSketch(Seq("a", "b"), Seq(0.5))
    assert(c.df.collect().map(_.getString(0)).toSet == Set("a"),
      "an all-null column contributes no rows")
    assert(c.df.columns.toSeq == Seq("col_name", "prob", "value", "n"))
  }

  test("sketch twins have the scale shape: no window sort, lint-clean") {
    import org.apache.spark.sql.execution.window.WindowExec
    val li = table("lineitem")
    val tm = li.trimmedMeanSketch("l_extendedprice", 0.1, Seq("l_returnflag"))
    val qp = li.quantileProfileSketch(Seq("l_quantity", "l_discount"), Seq(0.5, 0.9))
    Seq(("trimmed_mean_sketch", tm), ("quantile_profile_sketch", qp)).foreach {
      case (tag, ch) =>
        val plan = ch.df.queryExecution.sparkPlan
        assert(plan.collect { case w: WindowExec => w }.isEmpty,
          s"$tag must not sort through a window")
        val fs = ch.assertScaleSafe().scaleFindings
        assert(!fs.exists(_.rule == "low-domain-window-key"), s"$tag lints: $fs")
    }
  }

  test("sketch twins: rendered KLL faces are Spark-executable, equal in the exact regime") {
    // 40 values per group <= k=200: the sketch retains everything, both
    // evaluations are deterministic, so face and frame agree exactly
    val df = spark.range(0, 120, 1, 2).select((col("id") % 3).as("g"),
      ((col("id") * 37) % 101).cast("double").as("x"))
    df.createOrReplaceTempView("sk_src")
    val tm = Chain(spark, "sk_src", df).trimmedMeanSketch("x", 0.1, Seq("g"))
    assert(rows(spark.sql(tm.sql())) == rows(tm.df))
    val tmu = Chain(spark, "sk_src", df).trimmedMeanSketch("x", 0.2)
    assert(rows(spark.sql(tmu.sql())) == rows(tmu.df))
    val qp = Chain(spark, "sk_src", df).quantileProfileSketch(Seq("x"), Seq(0.25, 0.75), Seq("g"))
    assert(rows(spark.sql(qp.sql())) == rows(qp.df))
    val qpu = Chain(spark, "sk_src", df).quantileProfileSketch(Seq("x"), Seq(0.5))
    assert(rows(spark.sql(qpu.sql())) == rows(qpu.df))
  }

  // ---- numeric windowed drift ------------------------------------------

  private val tsBase = 1704067200L * 1000000000L
  private def evt(id: Long, v: Double, hour: Long) =
    Evt(id, tsBase + hour * 3600L * 1000000000L + (id % 60) * 1000000000L,
      id, "t", v, "{}")

  test("drift_by_window_numeric: stable window ~0 PSI, shifted window flags, spine-complete") {
    // reference: uniform mass over [0, 8) — two events per unit bucket
    val ref = (0 until 16).map(i => evt(i, i % 8 + 0.5, 0)).toDF()
    // hour 0 mirrors the reference mix; hour 1 concentrates in bucket 7;
    // plus boundary/degenerate probes: v=8.0 folds into the top bucket,
    // NaN and out-of-range values are excluded
    val ev = ((100 until 116).map(i => evt(i, i % 8 + 0.5, 0)) ++
      (200 until 216).map(i => evt(i, 7.5, 1)) :+
      evt(300, 8.0, 1) :+ evt(301, Double.NaN, 1) :+ evt(302, -1.0, 1) :+
      evt(303, 9.5, 1)).toDF()
    val out = EventStreams.driftByWindowNumeric(ev, ref, "value", "1 hour", 0.0, 8.0, 8)
    val totals = out.select("window_start", "psi_total").distinct().collect()
      .map(r => r.get(0).toString -> r.getDouble(1)).toMap
    assert(totals.size == 2)
    val (h0, h1) = (totals.keys.min, totals.keys.max)
    assert(math.abs(totals(h0)) < 1e-9, s"matching mix must read ~0, got ${totals(h0)}")
    assert(totals(h1) > 0.25, s"concentrated hour must read as shift, got ${totals(h1)}")
    // spine-complete: every window carries every bucket, even empty ones
    val perWin = out.groupBy("window_start").count().collect().map(_.getLong(1))
    assert(perWin.forall(_ == 8L), "each window must carry the full 8-bucket spine")
    // v=8.0 folded into the top bucket; NaN/out-of-range never counted
    // filter driver-side through the same .toString the keys use (the
    // TimestampNTZ LocalDateTime render differs from CAST AS STRING)
    val h1Counts = out.select("window_start", "bucket", "cnt_other").collect()
      .filter(_.get(0).toString == h1)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(h1Counts(7L) == 17L, s"16 + the hi-fold event, got ${h1Counts(7L)}")
    assert((0L to 6L).map(h1Counts).sum == 0L)
    // bucket bounds are the psiProfile arithmetic
    val b = out.where(col("bucket") === 3).select("bucket_lo", "bucket_hi")
      .distinct().collect()
    assert(b.length == 1 && b(0).getDouble(0) == 3.0 && b(0).getDouble(1) == 4.0)
  }

  test("numeric drift sink converges to the batch face; reference pinned spine-complete") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ref = (0 until 16).map(i => evt(i, i % 8 + 0.5, 0)).toDF()
    spark.sql("DROP TABLE IF EXISTS driftn_t")
    spark.sql("DROP TABLE IF EXISTS driftn_t_ref")
    var seen = Seq.empty[Evt]
    def drain(events: Evt*): Unit = {
      seen = seen ++ events
      val ms = MemoryStream[Evt]
      ms.addData(events: _*)
      EventStreams.sinkDriftNumericUpsertToTable(ms.toDF(), ref, "value", "1 hour",
        0.0, 8.0, 8, "driftn_t",
        java.nio.file.Files.createTempDirectory("graft_ckpt_dn").toString,
        profileBuckets = 4)
      val got = rows(spark.table("driftn_t").drop("_pb"))
      val want = rows(EventStreams.driftByWindowNumeric(
        seen.toDF(), ref, "value", "1 hour", 0.0, 8.0, 8))
      assert(got == want, s"sink diverged from batch face after ${seen.size} events")
    }
    drain((100 until 116).map(i => evt(i, i % 8 + 0.5, 0)): _*)
    // the pinned reference is spine-complete: 8 buckets, zeros included
    assert(spark.table("driftn_t_ref").count() == 8)
    // second batch: new shifted hour + a merge into hour 0
    drain(((200 until 208).map(i => evt(i, 7.5, 1)) ++
      (300 until 304).map(i => evt(i, 2.5, 0))): _*)
    val totals = spark.table("driftn_t").select("window_start", "psi_total")
      .distinct().collect().map(r => r.get(0).toString -> r.getDouble(1)).toMap
    assert(totals.size == 2 && totals.values.max > 0.25)
  }
}
