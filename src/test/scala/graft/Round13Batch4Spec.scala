package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for the round-13 fourth batch: the two-sample Kolmogorov–Smirnov
  * drift statistic and the mutual-information dependence census.
  */
class Round13Batch4Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- ksProfile --------------------------------------------------------

  test("ksProfile: hand example — shifted samples give D = 0.5") {
    val base = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val other = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")
    val got = Chain(spark, "ks1", base).ksProfile(other, "x").df.collect()(0)
    assert(got.getLong(0) == 4L && got.getLong(1) == 4L)
    assert(got.getLong(2) == 500000L, s"D must be 0.5, got ${got.getLong(2)}")
  }

  test("ksProfile: identical samples give 0, disjoint samples give 1") {
    val a = Seq(1.0, 2.0, 2.0, 7.0).toDF("x")
    val same = Chain(spark, "ks2", a).ksProfile(a, "x").df.collect()(0)
    assert(same.getLong(2) == 0L)
    val disjoint = Chain(spark, "ks3", Seq(1.0, 2.0).toDF("x"))
      .ksProfile(Seq(10.0, 11.0).toDF("x"), "x").df.collect()(0)
    assert(disjoint.getLong(2) == 1000000L)
  }

  test("ksProfile: null/NaN excluded; a side empty after exclusion reports NULL ks") {
    val base = Seq(Some(1.0), Some(Double.NaN), None, Some(2.0)).toDF("x")
    val other = Seq(Some(Double.NaN), Option.empty[Double]).toDF("x")
    val got = Chain(spark, "ks4", base).ksProfile(other, "x").df.collect()(0)
    assert(got.getLong(0) == 2L, "NaN and null never rank")
    assert(got.getLong(1) == 0L)
    assert(got.isNullAt(2), "no other-side distribution: ks must be NULL, not 0 or 1")
  }

  test("ksProfile grouped: equals the per-segment ungrouped runs; one-sided groups are NULL") {
    val docs = table("documents")
    val base = docs.filterRows(Seq("doc_id % 2 = 0"))
    val other = docs.df.where("doc_id % 2 = 1")
    val grouped = base.ksProfile(other, "n_chars", groupBy = Seq("lang"))
      .df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toMap
    val langs = docs.df.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { lg =>
      val single = base.filterRows(Seq(s"lang = '$lg'"))
        .ksProfile(other.where(s"lang = '$lg'"), "n_chars").df.collect()(0)
      val g = grouped(lg)
      assert(g._1 == single.getLong(0) && g._2 == single.getLong(1),
        s"group $lg counts")
      val sKs: Any = if (single.isNullAt(2)) null else single.getLong(2)
      assert(g._3 == sKs, s"group $lg ks")
    }
    // a group present only in the base frame
    val oneSided = Chain(spark, "ks5",
      Seq(("only", 1.0), ("only", 2.0), ("both", 3.0)).toDF("g", "x"))
      .ksProfile(Seq(("both", 4.0)).toDF("g", "x"), "x", groupBy = Seq("g"))
      .df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.isNullAt(3))).toMap
    assert(oneSided("only") == ((2L, 0L, true)),
      "base-only group: n_other 0, ks NULL")
    assert(oneSided("both") == ((1L, 1L, false)))
  }

  test("ksProfile: reserved/missing-column guards") {
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException] {
      Chain(spark, "ks6", df.withColumn("ks_fp", lit(1L)))
        .ksProfile(df, "x", groupBy = Seq("ks_fp"))
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "ks7", df).ksProfile(df.drop("x"), "x")
    }
  }

  // ---- mutualInformation ------------------------------------------------

  test("mutualInformation: bijectively dependent columns give MI = H exactly") {
    val df = Seq(("x", "X1"), ("x", "X1"), ("y", "Y1"), ("z", "Z1"))
      .toDF("a", "b")
    val got = Chain(spark, "mi1", df).mutualInformation("a", "b").df.collect()(0)
    assert(got.getAs[Long]("n") == 4L)
    assert(got.getAs[Long]("n_a") == 3L && got.getAs[Long]("n_b") == 3L &&
      got.getAs[Long]("n_ab") == 3L)
    val hA = got.getAs[Double]("h_a")
    assert(got.getAs[Double]("h_b") == hA && got.getAs[Double]("h_ab") == hA,
      "bijective mapping: all three entropies identical")
    assert(got.getAs[Double]("mi") == hA, "MI of a bijection is exactly H")
  }

  test("mutualInformation: independent uniform columns give MI = 0 exactly") {
    val df = Seq(("0", "0"), ("0", "1"), ("1", "0"), ("1", "1")).toDF("a", "b")
    val got = Chain(spark, "mi2", df).mutualInformation("a", "b").df.collect()(0)
    assert(got.getAs[Double]("mi") == 0.0,
      s"uniform product grid: MI exactly 0, got ${got.getAs[Double]("mi")}")
  }

  test("mutualInformation: null pairs excluded; SQL face agrees (plain and grouped)") {
    val df = Seq((Some("x"), Some("u"), "g1"), (Some("x"), None, "g1"),
      (None, Some("v"), "g1"), (Some("y"), Some("v"), "g1"),
      (Some("y"), Some("u"), "g2"), (Some("y"), Some("u"), "g2"))
      .toDF("a", "b", "g")
    val c = Chain(spark, "mi3", df).mutualInformation("a", "b")
    assert(c.df.collect()(0).getAs[Long]("n") == 4L, "rows with any null excluded")
    df.createOrReplaceTempView("mi3")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    val cg = Chain(spark, "mi3", df).mutualInformation("a", "b", groupBy = Seq("g"))
    assert(rows(spark.sql(cg.sql())) == rows(cg.df))
    assert(cg.df.count() == 2L)
  }

  test("mutualInformation: grouped equals per-segment; guards refuse misuse") {
    val docs = table("documents")
    val seg = Chain(spark, "mi_seg", docs.df
      .withColumn("half", (col("doc_id") % 2).cast("string")))
    val grouped = seg.mutualInformation("lang", "source", groupBy = Seq("half"))
      .df.collect().map(r => r.getString(0) -> r.getAs[Double]("mi")).toMap
    assert(grouped.size == 2)
    grouped.keys.foreach { h =>
      val single = seg.filterRows(Seq(s"half = '$h'"))
        .mutualInformation("lang", "source").df.collect()(0)
      assert(single.getAs[Double]("mi") == grouped(h), s"half $h")
    }
    intercept[IllegalArgumentException] {
      docs.mutualInformation("lang", "lang")
    }
    intercept[IllegalArgumentException] {
      seg.mutualInformation("lang", "source", groupBy = Seq("lang"))
    }
  }

  // ---- isotonicFit / isotonicScore --------------------------------------

  test("isotonicFit: PAV pools a violating bucket pair; empty buckets inherit") {
    // bucket 0 rate 0.5, bucket 1 rate 0 → violation pools to 1/3;
    // bucket 2 rate 1; bucket 3 empty → inherits 1.0
    val df = Seq((0.1, 0.0), (0.15, 1.0), (0.3, 0.0), (0.6, 1.0))
      .toDF("score", "label")
    val m = Chain(spark, "iso1", df).isotonicFit("score", "label", buckets = 4)
    val got = m.df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == ((2L, 1000000L, 333333L)), s"pooled block, got $got")
    assert(got(1L) == ((1L, 0L, 333333L)))
    assert(got(2L) == ((1L, 1000000L, 1000000L)))
    assert(got(3L) == ((0L, 0L, 1000000L)), "empty bucket inherits the previous block")
    // the VALUES render face reproduces the model
    assert(rows(spark.sql(m.sql())) == rows(m.df))
  }

  test("isotonicFit: calibrated rates are always non-decreasing; exclusions apply") {
    val df = spark.range(500).selectExpr("id",
      "CAST(id % 83 AS DOUBLE) / 83.0 AS score",
      // noisy non-monotone labels
      "CAST(CASE WHEN (id * 31) % 83 < (id * 57) % 83 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label")
      .union(spark.range(3).selectExpr("id", "CAST('NaN' AS DOUBLE)",
        "CAST(1.0 AS DOUBLE)"))
      .union(spark.range(3).selectExpr("id", "CAST(2.5 AS DOUBLE)",
        "CAST(1.0 AS DOUBLE)")) // out of range
    val m = Chain(spark, "iso2", df).isotonicFit("score", "label", buckets = 16)
    val cal = m.df.orderBy("bucket").collect().map(_.getLong(3))
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b },
      s"calibration must be monotone, got ${cal.mkString(",")}")
    assert(m.df.agg(sum("n")).collect()(0).getLong(0) == 500L,
      "NaN and out-of-range scores never enter the fit")
  }

  test("isotonicScore: bucket lookup, null/NaN/out-of-range → null, SQL face agrees") {
    val fitDf = Seq((0.1, 0.0), (0.15, 1.0), (0.3, 0.0), (0.6, 1.0))
      .toDF("score", "label")
    val m = Chain(spark, "iso3", fitDf).isotonicFit("score", "label", buckets = 4)
    val scoreDf = Seq(Some(0.05), Some(0.3), Some(0.99), Some(Double.NaN),
      None, Some(1.5)).toDF("score")
    val c = Chain(spark, "iso4", scoreDf).isotonicScore(m.df, "score")
    val got = c.df.collect().map(r =>
      (if (r.isNullAt(0)) "null" else r.getDouble(0).toString) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got("0.05") == 333333L)
    assert(got("0.3") == 333333L)
    assert(got("0.99") == 1000000L)
    assert(got("NaN") == -1L && got("null") == -1L && got("1.5") == -1L,
      "nothing to calibrate must be NULL, never clamped")
    scoreDf.createOrReplaceTempView("iso4")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("isotonic guards: empty fit, malformed model, colliding outputs refuse") {
    val df = Seq((2.0, 1.0)).toDF("score", "label") // out of range only
    intercept[IllegalArgumentException] {
      Chain(spark, "iso5", df).isotonicFit("score", "label", buckets = 4)
    }
    val good = Chain(spark, "iso6",
      Seq((0.2, 1.0), (0.8, 0.0)).toDF("score", "label"))
      .isotonicFit("score", "label", buckets = 4)
    intercept[IllegalArgumentException] {
      Chain(spark, "iso7", Seq(0.5).toDF("score"))
        .isotonicScore(good.df.where("bucket >= 1"), "score")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "iso8", Seq(0.5).toDF("score"))
        .isotonicScore(good.df.drop("cal_fp"), "score")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "iso9", Seq((0.5, 1L)).toDF("score", "score_cal_fp"))
        .isotonicScore(good.df, "score")
    }
  }

  test("mutualInformation: ONE corpus scan feeds joint and marginals") {
    val df = table("documents").mutualInformation("lang", "source").df
    df.collect()
    assert(countScans(df.queryExecution.executedPlan) == 1,
      "marginals must derive from the joint frame, not rescan the corpus")
  }
}
