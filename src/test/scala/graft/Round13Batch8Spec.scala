package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for the round-13 eighth batch: the test-statistic companions to
  * the drift effect sizes — Welch's t and χ² homogeneity.
  */
class Round13Batch8Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- tTestProfile -----------------------------------------------------

  test("tTest: hand-computed Welch statistic on a known two-sample fixture") {
    val base = Seq(1.0, 2.0, 3.0).toDF("x")
    val other = Seq(2.0, 4.0, 6.0).toDF("x")
    val r = Chain(spark, "tt1", base).tTestProfile(other, "x").df.collect()(0)
    assert(r.getAs[Long]("n_base") == 3L && r.getAs[Long]("n_other") == 3L)
    assert(r.getAs[Double]("mean_base") == 2.0 && r.getAs[Double]("mean_other") == 4.0)
    assert(r.getAs[Double]("var_base") == 1.0 && r.getAs[Double]("var_other") == 4.0)
    // recompute with the op's exact double chain
    val se1 = 1.0 / 3.0; val se2 = 4.0 / 3.0; val pooled = se1 + se2
    val expT = (2.0 - 4.0) / math.sqrt(pooled)
    val expDf = (pooled * pooled) / (se1 * se1 / 2.0 + se2 * se2 / 2.0)
    assert(r.getAs[Double]("t_stat") == expT, s"t: ${r.getAs[Double]("t_stat")} vs $expT")
    assert(r.getAs[Double]("df") == expDf)
  }

  test("tTest: NaN/null excluded; n<2 or zero spread yields NULL t; grouped = per-segment") {
    val base = Seq(Some(1.0), Some(Double.NaN), None, Some(3.0)).toDF("x")
    val tiny = Seq(5.0).toDF("x")
    val r = Chain(spark, "tt2", base).tTestProfile(tiny, "x").df.collect()(0)
    assert(r.getAs[Long]("n_base") == 2L && r.getAs[Long]("n_other") == 1L)
    assert(r.isNullAt(r.fieldIndex("t_stat")) && r.isNullAt(r.fieldIndex("df")),
      "a single-observation side cannot be tested — NULL, never Infinity")
    val const = Seq(2.0, 2.0, 2.0).toDF("x")
    val r2 = Chain(spark, "tt3", const).tTestProfile(const, "x").df.collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("t_stat")), "zero pooled SE: NULL, not 0/0")
    val docs = table("documents")
    val b = docs.filterRows(Seq("doc_id % 2 = 0"))
    val o = docs.df.where("doc_id % 2 = 1")
    val grouped = b.tTestProfile(o, "n_chars", groupBy = Seq("lang"))
      .df.collect().map(r3 => r3.getString(0) ->
        (r3.getAs[Double]("t_stat"), r3.getAs[Double]("df"))).toMap
    grouped.keys.foreach { lg =>
      val single = b.filterRows(Seq(s"lang = '$lg'"))
        .tTestProfile(o.where(s"lang = '$lg'"), "n_chars").df.collect()(0)
      assert((single.getAs[Double]("t_stat"), single.getAs[Double]("df")) ==
        grouped(lg), s"lang $lg")
    }
    intercept[IllegalArgumentException] {
      b.tTestProfile(o.drop("n_chars"), "n_chars")
    }
  }

  // ---- aucProfile -------------------------------------------------------

  test("aucProfile: perfect/inverted separation and a tied hand example") {
    val perfect = Seq((0.1, 0.0), (0.2, 0.0), (0.8, 1.0), (0.9, 1.0))
      .toDF("score", "label")
    val p = Chain(spark, "auc1", perfect).aucProfile("score", "label").df.collect()(0)
    assert(p.getAs[Double]("auc") == 1.0 && p.getAs[Long]("n_pos") == 2L)
    val inverted = Seq((0.9, 0.0), (0.8, 0.0), (0.1, 1.0)).toDF("score", "label")
    assert(Chain(spark, "auc2", inverted).aucProfile("score", "label")
      .df.collect()(0).getAs[Double]("auc") == 0.0)
    // scores [1,2,2,3], labels [0,0,1,1]: the tied 2s take midrank 2.5 →
    // U gives AUC = 7/8 exactly
    val tied = Seq((1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (3.0, 1.0))
      .toDF("score", "label")
    assert(Chain(spark, "auc3", tied).aucProfile("score", "label")
      .df.collect()(0).getAs[Double]("auc") == 0.875)
  }

  test("aucProfile: one-class groups are NULL; NaN/null excluded; grouped = per-segment") {
    val oneClass = Seq((0.3, 1.0), (0.7, 1.0)).toDF("score", "label")
    val r = Chain(spark, "auc4", oneClass).aucProfile("score", "label").df.collect()(0)
    assert(r.getAs[Long]("n_neg") == 0L && r.isNullAt(r.fieldIndex("auc")),
      "no negatives: nothing to rank against — NULL")
    val messy = Seq((Some(0.3), Some(1.0)), (Some(Double.NaN), Some(0.0)),
      (Some(0.6), None), (Some(0.8), Some(0.0))).toDF("score", "label")
    val m = Chain(spark, "auc5", messy).aucProfile("score", "label").df.collect()(0)
    assert(m.getAs[Long]("n_pos") + m.getAs[Long]("n_neg") == 2L)
    val docs = table("documents")
    val scored = Chain(spark, "auc6", docs.df.selectExpr("doc_id", "lang",
      "CAST((doc_id * 37) % 101 AS DOUBLE) / 101.0 AS score",
      "CAST(CASE WHEN (doc_id * 53) % 101 < 50 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label"))
    val grouped = scored.aucProfile("score", "label", groupBy = Seq("lang"))
      .df.collect().map(r2 => r2.getString(0) -> r2.getAs[Double]("auc")).toMap
    grouped.keys.foreach { lg =>
      val single = scored.filterRows(Seq(s"lang = '$lg'"))
        .aucProfile("score", "label").df.collect()(0)
      assert(single.getAs[Double]("auc") == grouped(lg), s"lang $lg")
    }
  }

  // ---- spearmanCorr -----------------------------------------------------

  test("spearmanCorr: monotone-nonlinear is 1, reversed is -1, constant side is NULL") {
    val df = (1 to 20).map(i => (i.toDouble, i.toDouble * i * i)).toDF("a", "b")
    val rho = Chain(spark, "sp1", df).spearmanCorr("a", "b").df.collect()(0)
    assert(math.abs(rho.getAs[Double]("rho") - 1.0) < 1e-12,
      s"monotone: rho 1, got ${rho.getAs[Double]("rho")}")
    val rev = (1 to 20).map(i => (i.toDouble, -i.toDouble)).toDF("a", "b")
    assert(math.abs(Chain(spark, "sp2", rev).spearmanCorr("a", "b")
      .df.collect()(0).getAs[Double]("rho") + 1.0) < 1e-12)
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b")
    val cr = Chain(spark, "sp3", const).spearmanCorr("a", "b").df.collect()(0)
    assert(cr.isNullAt(cr.fieldIndex("rho")), "constant side: NULL, not 0/0")
  }

  test("spearmanCorr: either-side null/NaN excluded pairwise; grouped = per-segment") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(2.0), Some(Double.NaN)),
      (None, Some(3.0)), (Some(3.0), Some(5.0)), (Some(4.0), Some(9.0)))
      .toDF("a", "b")
    val r = Chain(spark, "sp4", df).spearmanCorr("a", "b").df.collect()(0)
    assert(r.getAs[Long]("n") == 3L, "pairs with any null/NaN drop together")
    val docs = table("documents")
    val seg = Chain(spark, "sp5", docs.df.selectExpr("doc_id", "lang",
      "n_chars", "n_chars + doc_id % 50 AS noisy"))
    val grouped = seg.spearmanCorr("n_chars", "noisy", groupBy = Seq("lang"))
      .df.collect().map(r2 => r2.getString(0) -> r2.getAs[Double]("rho")).toMap
    grouped.keys.foreach { lg =>
      val single = seg.filterRows(Seq(s"lang = '$lg'"))
        .spearmanCorr("n_chars", "noisy").df.collect()(0)
      assert(single.getAs[Double]("rho") == grouped(lg), s"lang $lg")
    }
    intercept[IllegalArgumentException] { seg.spearmanCorr("n_chars", "n_chars") }
  }

  // ---- chiSquareHomogeneity ---------------------------------------------

  test("chi2 homogeneity: identical mixes give exactly 0; hand 2x2 value; empty side NULL") {
    val a = Seq("x", "x", "y").toDF("v")
    val same = Chain(spark, "ch1", a).chiSquareHomogeneity(a, "v").df.collect()(0)
    assert(same.getAs[Double]("chi2") == 0.0 && same.getAs[Long]("df") == 1L,
      s"identical mixes: exactly 0, got $same")
    // base: 30 x, 10 y; other: 10 x, 30 y — classic 2x2, chi2 = 20
    val b = (Seq.fill(30)("x") ++ Seq.fill(10)("y")).toDF("v")
    val o = (Seq.fill(10)("x") ++ Seq.fill(30)("y")).toDF("v")
    val r = Chain(spark, "ch2", b).chiSquareHomogeneity(o, "v").df.collect()(0)
    assert(math.abs(r.getAs[Double]("chi2") - 20.0) < 1e-5,
      s"hand 2x2: chi2 = 20, got ${r.getAs[Double]("chi2")}")
    assert(r.getAs[Long]("n_values") == 2L && r.getAs[Long]("df") == 1L)
    val empty = Seq(Option.empty[String]).toDF("v")
    val e = Chain(spark, "ch3", b).chiSquareHomogeneity(empty, "v").df.collect()(0)
    assert(e.getAs[Long]("n_other") == 0L)
    assert(e.isNullAt(e.fieldIndex("chi2")) && e.isNullAt(e.fieldIndex("df")),
      "nothing to test against: NULL, never a fake 0")
  }

  test("chi2 homogeneity grouped: equals per-segment; guards refuse misuse") {
    val docs = table("documents")
    val b = docs.filterRows(Seq("doc_id % 2 = 0"))
    val o = docs.df.where("doc_id % 2 = 1")
    val grouped = b.chiSquareHomogeneity(o, "source", groupBy = Seq("lang"))
      .df.collect().map(r => r.getString(0) -> r.getAs[Double]("chi2")).toMap
    grouped.keys.foreach { lg =>
      val single = b.filterRows(Seq(s"lang = '$lg'"))
        .chiSquareHomogeneity(o.where(s"lang = '$lg'"), "source").df.collect()(0)
      assert(single.getAs[Double]("chi2") == grouped(lg), s"lang $lg")
    }
    intercept[IllegalArgumentException] {
      b.chiSquareHomogeneity(o, "source", groupBy = Seq("chi2"))
    }
  }
}
