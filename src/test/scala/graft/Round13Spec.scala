package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for the round-13 batch: the one-corpus-scan grouped histogram
  * (the last corpus-side spine distinct, rewritten onto the
  * calibrationProfile null-bucket fold), its all-excluded-group and
  * null-group contracts, and the reserved-name guard the new internal
  * columns require.
  */
class Round13Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- histogram: one-scan grouped face (round-12 verdict ask #1) --------

  test("histogram grouped: ONE corpus scan in the physical plan") {
    val df = Chain(spark, "hist_scan",
      spark.read.parquet(s"$sfDir/orders.parquet"))
      .histogram("o_totalprice", 0.0, 500000.0, 8,
        groupBy = Seq("o_orderstatus")).df
    df.collect()
    val scans = countScans(df.queryExecution.executedPlan)
    assert(scans == 1,
      s"grouped histogram must scan the corpus exactly once, got $scans")
  }

  test("histogram grouped: all-excluded groups still emit zero-count buckets") {
    // b: only out-of-range; c: only NaN; d: only null — all three must
    // surface with a full spine of cnt = 0 (group discovery rides the
    // null bucket of the single aggregate)
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(9.0)), ("b", Some(99.0)),
      ("c", Some(Double.NaN)), ("d", Option.empty[Double]))
      .toDF("g", "x")
    val c = Chain(spark, "hgo", df).histogram("x", 0.0, 10.0, 2,
      groupBy = Seq("g"))
    val got = c.df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    assert(got.size == 8, s"4 groups x 2 buckets expected, got $got")
    for (g <- Seq("b", "c", "d"); b <- Seq(0L, 1L))
      assert(got((g, b)) == 0L, s"all-excluded group $g bucket $b must be 0")
    assert(got(("a", 0L)) == 1L && got(("a", 1L)) == 1L)
    df.createOrReplaceTempView("hgo")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("histogram grouped: NULL group value keeps its counts; SQL face agrees") {
    val df = Seq((Some("a"), 1.0), (Option.empty[String], 2.0), (None, 7.0))
      .toDF("g", "x")
    val c = Chain(spark, "hng", df).histogram("x", 0.0, 10.0, 2,
      groupBy = Seq("g"))
    val nullG = c.df.where(col("g").isNull).collect()
      .map(r => r.getLong(1) -> r.getAs[Long]("cnt")).toMap
    assert(nullG == Map(0L -> 1L, 1L -> 1L),
      s"null group must carry its real counts, got $nullG")
    df.createOrReplaceTempView("hng")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("histogram: group columns colliding with output/internal names refuse") {
    val df = Seq((1.0, 0L)).toDF("x", "bucket")
    val e = intercept[IllegalArgumentException] {
      Chain(spark, "hrs", df).histogram("x", 0.0, 10.0, 2,
        groupBy = Seq("bucket"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("histogram grouped: empty input completes with zero rows") {
    val empty = Seq.empty[(String, Double)].toDF("g", "x")
    val c = Chain(spark, "hge", empty).histogram("x", 0.0, 10.0, 4,
      groupBy = Seq("g"))
    assert(c.df.count() == 0)
  }

  // ---- ScaleLint: corpus-rescan spine (round-12 verdict ask #2) -----------

  private def hasRescanSpine(df: org.apache.spark.sql.DataFrame): Boolean =
    graft.core.ScaleLint.lint(df).exists(_.rule == "corpus-rescan-spine")

  test("ScaleLint flags the pre-fix histogram shape: distinct-spine branch beside an aggregate") {
    // the exact round-10 grouped-histogram shape this round designed out
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val x = col("o_totalprice").cast("double")
    val b = least(floor(x / lit(62500.0)).cast("long"), lit(7L))
    val counts = o.where(x.isNotNull && x >= 0.0 && x <= 500000.0)
      .groupBy(col("o_orderstatus"), b.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val spine = o.select(col("o_orderstatus")).distinct()
      .crossJoin(broadcast(spark.range(8).select(col("id").as("bucket"))))
    val joined = spine.join(counts, Seq("o_orderstatus", "bucket"), "left")
    assert(hasRescanSpine(joined),
      "the distinct->crossJoin(Range) + aggregate double-scan must lint")
  }

  test("ScaleLint: post-fix grouped histogram and datespine_groups stay clean") {
    val ordersC = table("orders")
    assert(!hasRescanSpine(ordersC
        .histogram("o_totalprice", 0.0, 500000.0, 8,
          groupBy = Seq("o_orderstatus")).df),
      "the one-scan grouped histogram must not lint")
    // datespine_groups: the distinct IS the op's semantics — its spine
    // arrives via a generator and the second corpus branch is
    // row-preserving, so the rule's structure excludes it BY SHAPE,
    // not by name
    assert(!hasRescanSpine(ordersC
        .datespineGroups(Seq("o_orderstatus"), "o_orderdate",
          "1995-01-01", "1995-01-31").df),
      "datespine_groups' semantic distinct must not lint")
  }
}
