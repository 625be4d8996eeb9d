package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import TestSpark._

/** Gates for the round-11 windowed-quantile family: the per-window KLL
  * profile (quantilesByWindow — one mergeable sketch aggregate per cell,
  * no per-window sort) and the stored-sketch streaming sink that makes it
  * continuous (sinkQuantileSketchToTable + the kll_union merge scalar),
  * completing the stored-sketch trio next to the HLL distinct and
  * frequent-items sinks. KLL compaction is randomized, so assertions are
  * pinned to the EXACT (no-compaction, n ≤ k) regime where readouts are
  * literal inclusive-rank order statistics — merge-order- and
  * batch-slicing-invariant; approximate-regime behavior stays rank-band
  * gated in QuantGateSpec's style, never byte- or estimate-pinned.
  */
class Round11Batch3Spec extends AnyFunSuite {
  import spark.implicits._

  private val base = 1704067200L * 1000000000L // 2024-01-01T00:00Z, in nanos
  private def evt(id: Long, minute: Long, tpe: String, v: Double) =
    Evt(id, base + minute * 60L * 1000000000L, 1L, tpe, v, "{}")

  test("quantiles_by_window: inclusive-rank order statistics per (hour, key) cell") {
    // hour 0 / type a: values {10, 20, 30, 40} -> p50 = rank>=2 -> 20,
    // p95 = rank>=3.8 -> 40; hour 1 / type a: {5} -> both probs read 5;
    // a NaN and a null value are excluded (n counts valid only); a cell
    // that is ALL invalid (hour 2 / type b) is dropped, not emitted
    val rowsIn = Seq(
      evt(1, 0, "a", 10), evt(2, 10, "a", 40), evt(3, 20, "a", 20),
      evt(4, 30, "a", 30), evt(5, 40, "a", Double.NaN),
      evt(6, 70, "a", 5),
      evt(7, 130, "b", Double.NaN)).toDF()
      .union(spark.sql(s"SELECT CAST(8 AS BIGINT), CAST(${base + 50L * 60L * 1000000000L} AS BIGINT), " +
        "CAST(1 AS BIGINT), 'a', CAST(NULL AS DOUBLE), '{}'"))
    val out = EventStreams.quantilesByWindow(rowsIn, "value", "1 hour",
      Seq(0.5, 0.95), Seq("event_type"), k = 64)
    val got = out.collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).getHour, r.getString(1),
        r.getDouble(2)) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(got.size == 4, s"2 valid cells x 2 probs, got ${got.keySet}")
    assert(got((0, "a", 0.5)) == (20.0, 4L), "p50 of {10,20,30,40} is rank>=2 -> 20")
    assert(got((0, "a", 0.95)) == (40.0, 4L), "p95 is rank>=3.8 -> 40")
    assert(got((1, "a", 0.5)) == (5.0, 1L) && got((1, "a", 0.95)) == (5.0, 1L))
  }

  test("quantiles_by_window exact regime matches a sorted replay on real data") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val got = rows(EventStreams.quantilesByWindow(ev, "value", "1 hour",
      Seq(0.5), Seq("event_type"), k = 512))
    // the literal inclusive-rank search, window-function spelling
    val xr = { val x = col("value").cast("double"); when(!isnan(x), x) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start", "event_type")
    val want = rows(ev
      .withColumn("window_start",
        window(EventStreams.eventTime(ev), "1 hour").getField("start")
          .cast("timestamp_ntz"))
      .select(col("window_start"), col("event_type"), xr.as("x"))
      .withColumn("rn", row_number().over(w.orderBy(col("x").asc_nulls_last)))
      .withColumn("n", count(col("x")).over(w))
      .groupBy("window_start", "event_type")
      .agg(lit(0.5).as("prob"),
        min(when(col("rn").cast("double") >= lit(0.5) * col("n").cast("double"),
          col("x"))).as("value"),
        count(col("x")).as("n"))
      .where(col("n") > 0))
    assert(got == want, "exact-regime sketch readout must equal the order statistic")
  }

  test("kll_union: null-coalescing merge, exact-regime readout, SQL spelling") {
    val a = Seq(1.0, 2.0).toDF("v").agg(
      graft.functions.KllSketches.sketchAgg(col("v"), 64).as("sk"))
    val merged = a.select(graft.functions.KllSketches.quantile(
      graft.functions.KllSketches.union(col("sk"), lit(null).cast("binary")),
      1.0).as("q")).collect()(0).getDouble(0)
    assert(merged == 2.0, "null right side must adopt the left sketch unchanged")
    val viaSql = spark.sql(
      "SELECT kll_quantile(kll_union(kll_sketch_agg(CAST(v AS DOUBLE), 64), " +
        "CAST(NULL AS BINARY)), CAST(0.5 AS DOUBLE)) " +
        "FROM VALUES (1.0), (2.0), (3.0) AS t(v)").collect()(0).getDouble(0)
    assert(viaSql == 2.0, "registry spelling must resolve and read the median")
  }

  test("quantile sink accumulates across batches and converges to the one-shot readout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS kll_profile_t")
    var seen = Seq.empty[Evt]
    def readout(df: org.apache.spark.sql.DataFrame) = rows(df.select(col("event_type"),
      graft.functions.KllSketches.quantile(col("_sk"), 0.5).as("p50"),
      graft.functions.KllSketches.quantile(col("_sk"), 0.95).as("p95"),
      col("_n")))
    def drain(events: Evt*): Unit = {
      seen = seen ++ events
      val ms = MemoryStream[Evt]
      ms.addData(events: _*)
      EventStreams.sinkQuantileSketchToTable(ms.toDF(), Seq("event_type"), "value",
        "kll_profile_t",
        java.nio.file.Files.createTempDirectory("graft_ckpt_kll").toString,
        k = 256, profileBuckets = 4)
      // exact regime: stored-sketch readouts must equal a ONE-SHOT
      // aggregation over everything ever ingested, whatever the slicing
      val want = readout(seen.toDF().groupBy("event_type")
        .agg(graft.functions.KllSketches.sketchAgg(
          col("value").cast("double"), 256).as("_sk"),
          count(col("value")).as("_n")))
      assert(readout(spark.table("kll_profile_t")) == want,
        s"sink diverged from one-shot readout after ${seen.size} events")
    }
    drain((1L to 9L).map(i => evt(i, i, "click", i.toDouble)) :+
      evt(20, 20, "view", 100.0): _*)
    // batch 2 extends click's distribution upward and adds a new type:
    // p95 must move (merge really happened), view must persist untouched
    drain((1L to 5L).map(i => evt(30 + i, 30 + i, "click", 90.0 + i)) :+
      evt(40, 40, "scroll", 7.0): _*)
    val p95 = spark.table("kll_profile_t").where(col("event_type") === "click")
      .select(graft.functions.KllSketches.quantile(col("_sk"), 0.95))
      .collect()(0).getDouble(0)
    assert(p95 == 95.0, s"p95 of 1..9 ++ 91..95 is rank>=13.3 -> the 14th value 95, got $p95")
  }

  test("quantile sink: an all-empty stream never creates the table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS kll_profile_empty_t")
    val ms = MemoryStream[Evt]
    EventStreams.sinkQuantileSketchToTable(ms.toDF(), Seq("event_type"), "value",
      "kll_profile_empty_t",
      java.nio.file.Files.createTempDirectory("graft_ckpt_klle").toString)
    assert(!spark.catalog.tableExists("kll_profile_empty_t"))
  }

  test("distinct_by_window: exact in the coupon regime, null-skipping, scale safe") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val got = rows(EventStreams.distinctByWindow(ev, "user_id", "1 hour",
      Seq("event_type")))
    val want = rows(ev
      .withColumn("window_start",
        window(EventStreams.eventTime(ev), "1 hour").getField("start")
          .cast("timestamp_ntz"))
      .groupBy("window_start", "event_type")
      .agg(countDistinct(col("user_id")).as("n_distinct"),
        count(col("user_id")).as("n")))
    assert(got == want, "coupon-regime HLL estimate must equal exact COUNT(DISTINCT)")
    graft.core.ScaleLint.assertSafe(
      EventStreams.distinctByWindow(ev, "user_id", "1 hour", Seq("event_type")))
  }

  test("quantiles_by_window scale shape: no global window, bounded builds") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val out = EventStreams.quantilesByWindow(ev, "value", "1 hour",
      Seq(0.5, 0.95), Seq("event_type"), k = 512)
    graft.core.ScaleLint.assertSafe(out)
  }
}
