package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-13 fifth batch: feature-relevance ranking (per-
  * feature MI against a label on one melted scan) and Matryoshka
  * embedding truncation with exact fixed-point re-normalization.
  */
class Round13Batch5Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- featureRelevance -------------------------------------------------

  test("featureRelevance: determining feature scores u≈1, constant feature exactly 0") {
    val df = Seq(
      ("a1", "c", "L1"), ("a1", "c", "L1"), ("a2", "c", "L2"),
      ("a3", "c", "L2"), ("a3", "c", "L2"), ("a4", "c", "L1"))
      .toDF("informative", "useless", "label")
    val got = Chain(spark, "fr1", df)
      .featureRelevance("label", Seq("informative", "useless"))
      .df.collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mi"), r.getAs[Double]("u"), r.getAs[Long]("n"))).toMap
    // 'informative' determines the label (a1,a4→L1; a2,a3→L2): MI = H(L)
    assert(math.abs(got("informative")._2 - 1.0) < 1e-9,
      s"determining feature: u must be ~1, got ${got("informative")}")
    // constant feature: MI ~0 up to the documented per-term quantization
    // residue (each c·ln(c) term floors independently — ≈1e-6 band)
    assert(math.abs(got("useless")._1) <= 2e-6 && math.abs(got("useless")._2) <= 4e-6,
      s"constant feature: MI within the quantization band of 0, got ${got("useless")}")
    assert(got.values.forall(_._3 == 6L))
    assert(got("informative")._1 > got("useless")._1, "ranking must separate them")
  }

  test("featureRelevance: per-feature null exclusion; SQL face agrees plain and grouped") {
    val df = Seq(
      (Some("x"), Some("p"), "L1", "g1"), (None, Some("q"), "L2", "g1"),
      (Some("y"), None, "L2", "g1"), (Some("x"), Some("p"), "L1", "g2"),
      (Some("y"), Some("q"), "L2", "g2"))
      .toDF("f1", "f2", "label", "g")
    val c = Chain(spark, "fr2", df).featureRelevance("label", Seq("f1", "f2"))
    val ns = c.df.collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(ns == Map("f1" -> 4L, "f2" -> 4L),
      s"each feature excludes exactly its own nulls, got $ns")
    df.createOrReplaceTempView("fr2")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    val cg = Chain(spark, "fr2", df)
      .featureRelevance("label", Seq("f1", "f2"), groupBy = Seq("g"))
    assert(rows(spark.sql(cg.sql())) == rows(cg.df))
    assert(cg.df.count() == 4L, "2 groups x 2 features")
  }

  test("featureRelevance: ONE corpus scan; guards refuse misuse") {
    val docs = table("documents")
    val df = docs.featureRelevance("lang", Seq("source")).df
    df.collect()
    assert(countScans(df.queryExecution.executedPlan) == 1,
      "joint and both marginals must share the single melted scan")
    intercept[IllegalArgumentException] {
      docs.featureRelevance("lang", Seq("lang"))
    }
    intercept[IllegalArgumentException] {
      docs.featureRelevance("lang", Seq("source", "source"))
    }
    intercept[IllegalArgumentException] {
      docs.featureRelevance("lang", Seq("source"), groupBy = Seq("source"))
    }
  }

  // ---- truncateEmbeddings -----------------------------------------------

  test("truncateEmbeddings: exact renorm hand check and unit output norms") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f, 9.0f, 9.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 1.0f)),          // zero-norm prefix
      (3L, Array(Float.NaN, 1.0f, 1.0f, 1.0f)))     // NaN prefix
      .toDF("id", "vec")
    val c = Chain(spark, "te1", df).truncateEmbeddings("vec", 2, as = "t")
    val got = c.df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) null else r.getSeq[Double](2))).toMap
    assert(got(1L) == Seq(0.6, 0.8), s"3-4-5 triangle: exact (0.6, 0.8), got ${got(1L)}")
    assert(got(2L) == null, "zero-norm prefix must be NULL")
    assert(got(3L) == null, "NaN prefix must be NULL")
    // engine face agrees (registered kernel)
    df.createOrReplaceTempView("te1")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    // real embeddings: every output has ~unit norm
    val emb = table("embeddings").truncateEmbeddings("embedding", 16)
    val norms = emb.df.select(
      sqrt(graft.core.Exact.dot(col("embedding_t"), col("embedding_t"))).as("n2"))
      .collect().map(_.getDouble(0))
    assert(norms.nonEmpty && norms.forall(n => math.abs(n - 1.0) < 1e-9),
      s"renormalized prefixes must be unit vectors, worst ${norms.maxBy(n => math.abs(n - 1.0))}")
  }

  test("truncateEmbeddings: short vectors throw; null stays null; slice face keeps type") {
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "vec")
    val nullRow = Chain(spark, "te2", df).truncateEmbeddings("vec", 2, as = "t")
      .df.where("id = 2").collect()(0)
    assert(nullRow.isNullAt(2), "null vector stays null")
    val boom = intercept[Exception] {
      Chain(spark, "te3", df).truncateEmbeddings("vec", 3, as = "t").df.collect()
    }
    assert(boom.getMessage != null)
    // non-renorm: element type preserved, values sliced verbatim
    val c = Chain(spark, "te4", df.where("id = 1"))
      .truncateEmbeddings("vec", 1, renormalize = false, as = "t")
    assert(c.df.schema("t").dataType == df.schema("vec").dataType,
      "slice face preserves the source array type")
    assert(c.df.collect()(0).getSeq[Float](2) == Seq(1.0f))
    df.where("id = 1").createOrReplaceTempView("te4")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "te5", df).truncateEmbeddings("missing", 2)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "te6", df.withColumn("t", lit(1)))
        .truncateEmbeddings("vec", 2, as = "t")
    }
  }
}
