package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-13 third batch: the CCNet-style hashed-LM quality
  * filter (lmModel/lmScore — fit on a clean corpus, score as a pure
  * projection), quantile normalization onto a reference distribution, and
  * centroid-based cluster-quality evaluation.
  */
class Round13Batch3Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- lmModel / lmScore (CCNet perplexity-filter analogue) --------------

  private def lmFixture = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "cats and dogs and cats"),
    (4L, "zzz qqq xxx vvv kkk")).toDF("id", "text")

  test("lmModel: B rows, counts sum to the corpus gram total, lp_fp replays") {
    val c = Chain(spark, "lmf", lmFixture)
    val m = c.lmModel("text", buckets = 64).df.collect()
    assert(m.length == 64)
    val nTokens = 6 + 6 + 5 + 5
    val nGrams = (2 * 6 - 1) + (2 * 6 - 1) + (2 * 5 - 1) + (2 * 5 - 1)
    assert(nTokens == 22 && m.map(_.getLong(1)).sum == nGrams)
    val tot = nGrams.toDouble
    m.foreach { r =>
      val expect = math.floor(
        math.log((r.getLong(1) + 1.0) / (tot + 64)) * 1e6 + 0.5).toLong
      assert(r.getLong(2) == expect, s"bucket ${r.getLong(0)} lp_fp")
      assert(r.getLong(2) < 0L, "every smoothed log-prob is negative")
    }
  }

  test("lmScore: kernel agrees gram-for-gram with the Column reference formulation") {
    val c = Chain(spark, "lms", lmFixture)
    val model = c.lmModel("text", buckets = 64)
    val scored = c.lmScore(model.df, "text").df
    // reference formulation: explode uniBi grams, bucket each with the
    // Column-level md5 digit parse, join the model, sum -lp_fp
    val ref = lmFixture
      .select(col("id"), explode(SelectionOps.uniBi(col("text"))).as("g"))
      .select(col("id"), SelectionOps.gramBucket(col("g"), 64).as("bucket"))
      .join(model.df, "bucket")
      .groupBy("id")
      .agg(count(lit(1)).as("n"), (-sum("lp_fp")).as("nll"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    scored.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Long]("lm_n_grams") == ref(id)._1, s"doc $id gram count")
      assert(r.getAs[Long]("lm_nll_sum_fp") == ref(id)._2, s"doc $id NLL sum")
      val mean = math.floor(ref(id)._2.toDouble / ref(id)._1.toDouble + 0.5).toLong
      assert(r.getAs[Long]("lm_nll_fp") == mean, s"doc $id mean NLL")
    }
  }

  test("lmScore: out-of-vocabulary text scores strictly worse than in-corpus text") {
    val c = Chain(spark, "lmq", lmFixture)
    val model = c.lmModel("text", buckets = 64)
    val nll = c.lmScore(model.df, "text").df.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("lm_nll_fp")).toMap
    // doc 4 is gibberish sharing no grams with anything: its average NLL
    // must exceed every in-distribution doc's (the filter's whole point)
    assert(Seq(1L, 2L, 3L).forall(d => nll(d) < nll(4L)),
      s"gibberish must score worst, got $nll")
  }

  test("lmScore: pure projection — no shuffle exchange in the plan") {
    val docs = table("documents")
    val model = docs.lmModel("text", buckets = 256)
    val df = docs.lmScore(model.df, "text").df
    df.collect()
    val plan = df.queryExecution.executedPlan
    var exchanges = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        exchanges += 1
      case _ => ()
    }
    assert(exchanges == 0, s"lm_score must be a pure projection, got $exchanges shuffles")
    assert(countScans(plan) == 1, "one corpus scan")
  }

  test("lmScore: model validation — wrong shape, gaps, duplicates, collisions all refuse") {
    val c = Chain(spark, "lmv", lmFixture)
    val model = c.lmModel("text", buckets = 64)
    intercept[IllegalArgumentException] {
      c.lmScore(model.df.where("bucket < 10"), "text")
    }
    intercept[IllegalArgumentException] {
      c.lmScore(model.df.select((col("bucket") + lit(1000)).as("bucket"),
        col("lp_fp")), "text")
    }
    intercept[IllegalArgumentException] {
      c.lmScore(model.df.drop("lp_fp"), "text")
    }
    intercept[IllegalArgumentException] {
      c.lmScore(model.df.union(model.df), "text")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "lmv2", lmFixture.withColumn("lm_nll_fp", lit(1L)))
        .lmScore(model.df, "text")
    }
    intercept[IllegalArgumentException] { c.lmModel("text", buckets = 8) }
  }

  // ---- quantileNormalize ------------------------------------------------

  test("quantileNormalize: pooled mapping hand-example; SQL face agrees") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0), ("b", 40.0)).toDF("g", "x")
    val c = Chain(spark, "qn1", df).quantileNormalize("x", Seq("g"))
    val got = c.df.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getAs[Double]("x_qnorm")).toMap
    // pooled sorted: [1,2,3,4,10,20,30,40]; rank r of 4 maps to pooled
    // rank ceil(r*8/4) = 2r — every group lands on the same grid
    val expect = Map(
      ("a", 1.0) -> 2.0, ("a", 2.0) -> 4.0, ("a", 3.0) -> 20.0, ("a", 4.0) -> 40.0,
      ("b", 10.0) -> 2.0, ("b", 20.0) -> 4.0, ("b", 30.0) -> 20.0, ("b", 40.0) -> 40.0)
    assert(got == expect, s"got $got")
    df.createOrReplaceTempView("qn1")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("quantileNormalize: ungrouped self-normalization is the identity") {
    val c = table("documents").quantileNormalize("n_chars")
    val bad = c.df.where(col("n_chars_qnorm") =!= col("n_chars").cast("double"))
    assert(bad.count() == 0, "qnorm onto own pooled distribution must be the identity")
  }

  test("quantileNormalize: null stays null, NaN passes through, ties normalize identically") {
    val df = Seq(Some(1.0), Some(Double.NaN), None, Some(3.0), Some(3.0))
      .toDF("x").withColumn("g", lit("z"))
    val c = Chain(spark, "qn2", df).quantileNormalize("x", Seq("g"))
    val got = c.df.collect().map(r =>
      Option(r.get(0)).map(_.toString).getOrElse("null") ->
        Option(r.get(2)).map(_.toString).getOrElse("null")).toMap
    assert(got("null") == "null")
    assert(got("NaN") == "NaN")
    assert(got("1.0") == "1.0")
    // tied 3.0s: rank() shares the min rank → both map to the same value
    assert(got("3.0") == "3.0")
  }

  test("quantileNormalize: side reference maps rank fractions onto the reference values") {
    val corpus = Chain(spark, "qn3", (0 until 10).map(i => i.toDouble).toDF("x"))
    val ref = Chain(spark, "qn3r", Seq(100.0, 200.0).toDF("x"))
    val got = corpus.quantileNormalize("x", reference = Some(ref))
      .df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    (0 until 10).foreach { i =>
      val expect = if (i < 5) 100.0 else 200.0
      assert(got(i.toDouble) == expect, s"value $i")
    }
    // empty reference nulls the output
    val empty = Chain(spark, "qn3e", Seq(1.0).toDF("x").where(lit(false)))
    val nulls = corpus.quantileNormalize("x", reference = Some(empty)).df.collect()
    assert(nulls.forall(_.isNullAt(1)), "empty reference must null the output")
  }

  test("quantileNormalize: reserved-name and missing-column guards") {
    val df = Seq((1.0, 2.0)).toDF("x", "_qn_r")
    intercept[IllegalArgumentException] {
      Chain(spark, "qng", df).quantileNormalize("x")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "qng2", Seq(1.0).toDF("x")).quantileNormalize("x",
        reference = Some(Chain(spark, "qng3", Seq(1).toDF("y"))))
    }
  }

  test("quantileNormalizeSketch: bounded rank displacement vs the exact face") {
    val docs = table("documents")
    val exact = docs.quantileNormalize("n_chars", Seq("source"))
      .df.select(col("doc_id"), col("n_chars_qnorm")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sketch = docs.quantileNormalizeSketch("n_chars", Seq("source"),
      levels = 250).df.select(col("doc_id"), col("n_chars_qnorm")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pooled = docs.df.select(col("n_chars").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    def pos(v: Double): Int = {
      val i = java.util.Arrays.binarySearch(pooled, v)
      if (i >= 0) i else -(i + 1)
    }
    val n = pooled.length
    val worst = exact.keys.map(k => math.abs(pos(exact(k)) - pos(sketch(k)))).max
    // KLL k=200 rank error (±1.65%) + the 1/250 grid — generous 5% band
    assert(worst <= math.max(4, (0.05 * n).toInt),
      s"sketch qnorm displaced $worst ranks of $n from the exact face")
    // sketch output values all come from the reference value set
    assert(sketch.values.forall(v => pos(v) < n && pooled(pos(v)) == v))
  }

  // ---- clusterEval ------------------------------------------------------

  test("clusterEval: separable fixture scores positive, scrambled labels score lower") {
    // two tight orthogonal bundles: cluster p hugs e1, cluster q hugs e2
    val rows = Seq(
      ("p", Array(1.0, 0.02)), ("p", Array(1.0, -0.02)), ("p", Array(0.98, 0.0)),
      ("q", Array(0.02, 1.0)), ("q", Array(-0.02, 1.0)), ("q", Array(0.0, 0.98)))
    val df = rows.toDF("k", "vec")
    val got = Chain(spark, "cev", df).clusterEval("k", "vec").df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("p", "q"))
    got.values.foreach { case (n, intra, sil) =>
      assert(n == 3L)
      assert(intra >= 0L && intra < 10000L, s"tight bundle: tiny intra, got $intra")
      assert(sil > 900000L, s"separable clusters: silhouette near 1, got $sil")
    }
    // scrambled assignment: mix the bundles — silhouette must collapse
    val scrambled = Seq(
      ("p", Array(1.0, 0.02)), ("q", Array(1.0, -0.02)), ("p", Array(0.98, 0.0)),
      ("q", Array(0.02, 1.0)), ("p", Array(-0.02, 1.0)), ("q", Array(0.0, 0.98)))
    val got2 = Chain(spark, "cev2", scrambled.toDF("k", "vec"))
      .clusterEval("k", "vec").df.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    got2.values.foreach(sil =>
      assert(sil < 400000L, s"scrambled labels must score low, got $got2"))
  }

  test("clusterEval: single cluster has zero silhouette; unusable rows excluded") {
    val df = Seq(
      (Some("only"), Array(1.0, 0.0)),
      (Some("only"), Array(0.9, 0.1)),
      (Option.empty[String], Array(0.5, 0.5)),      // null cluster: out
      (Some("only"), Array(Double.NaN, 1.0)),       // NaN vec: out
      (Some("only"), Array(0.0, 0.0))).toDF("k", "vec") // zero norm: out
    val got = Chain(spark, "cev3", df).clusterEval("k", "vec").df.collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 2L, "only the two usable rows count")
    assert(got(0).getLong(3) == 0L, "single cluster: silhouette 0 by convention")
  }

  test("clusterEval: zero-norm centroid, over-cardinality, and reserved names refuse") {
    val cancel = Seq(("z", Array(1.0, 0.0)), ("z", Array(-1.0, 0.0)),
      ("w", Array(0.0, 1.0))).toDF("k", "vec")
    intercept[IllegalArgumentException] {
      Chain(spark, "cev4", cancel).clusterEval("k", "vec")
    }
    val many = (0 until 5).map(i => (s"c$i", Array(1.0, i.toDouble))).toDF("k", "vec")
    intercept[IllegalArgumentException] {
      Chain(spark, "cev5", many).clusterEval("k", "vec", maxClusters = 3)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "cev6", Seq(("a", Array(1.0), 1L)).toDF("k", "vec", "n"))
        .clusterEval("k", "vec")
    }
  }

  test("clusterEval: the scoring pass is ONE corpus scan") {
    val df = table("embeddings").clusterEval("label", "embedding").df
    df.collect()
    assert(countScans(df.queryExecution.executedPlan) == 1,
      "scan 2 must be a single pass (centroids ride as literals)")
  }
}
