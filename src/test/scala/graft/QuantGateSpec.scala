package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ext._
import graft.ops._
import TestSpark._

/** Quantitative gates for every query without a DuckDB oracle. Each
  * approximate/engine-specific operator is measured against its exact
  * sibling on the driver test data with a numeric floor — sketches and
  * samples don't get to be "rows > 0 and hope":
  *
  *  - minhash/simhash candidate pairs vs exact n-gram Jaccard pairs
  *  - LSH / IVF / hamming top-k recall@k vs exact cosine top-k
  *  - Bernoulli sample size vs binomial bounds
  *  - approx_count_distinct / percentile_approx vs exact aggregates
  *  - rolling fingerprints vs planted verbatim window overlap
  *
  * All operators here are deterministic (hash-seeded sketches, seeded
  * sampling, fixed data), so the floors sit just under the measured
  * values — a regression that costs a few points of recall fails loudly.
  */
class QuantGateSpec extends AnyFunSuite {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def topkPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // exact bigram-Jaccard pairs: the ground truth for both text-sketch gates
  private lazy val exactNgramPairs: Map[(Long, Long), Double] =
    table("documents").ngramJaccardPairs("doc_id", "text", n = 2, threshold = 0.5)
      .df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  // exact cosine top-10: the ground truth for the three ANN gates
  private lazy val exactTop10: Set[(Long, Long)] = {
    val emb = table("embeddings")
    topkPairs(emb.cosineTopK(emb.df.where("vec_id < 5"), "vec_id", "embedding", 10).df)
  }

  private def recallOf(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double = {
    assert(truth.nonEmpty, "ground-truth set must not be empty")
    (truth & got).size.toDouble / truth.size
  }

  test("minhash LSH recovers >=90% of exact near-dup pairs (j >= 0.8)") {
    val strong = exactNgramPairs.filter(_._2 >= 0.8).keySet
    val mh = pairSet(table("documents").minhashLsh("doc_id", "text",
      shingleWords = 2, numHashes = 32, bands = 8, estThreshold = 0.5).df)
    val recall = recallOf(mh, strong)
    assert(recall >= 0.9, f"minhash recall $recall%.3f < 0.9 (truth ${strong.size} pairs)")
  }

  test("simhash recovers >=85% of exact near-dup pairs (j >= 0.9)") {
    val vstrong = exactNgramPairs.filter(_._2 >= 0.9).keySet
    val sh = pairSet(table("documents").simhashPairs("doc_id", "text", maxHamming = 8).df)
    val recall = recallOf(sh, vstrong)
    assert(recall >= 0.85, f"simhash recall $recall%.3f < 0.85 (truth ${vstrong.size} pairs)")
  }

  test("hamming sketch-rerank reaches recall@10 >= 0.8 at <= 25% exact scan") {
    val emb = table("embeddings")
    val n = emb.df.count()
    val rerank = 125 // the q_sim_topk_hamming dial
    assert(rerank <= n / 4, s"rerank budget $rerank exceeds 25% of corpus $n")
    val got = topkPairs(emb.hammingCosineTopK(emb.df.where("vec_id < 5"),
      "vec_id", "embedding", 10, planes = 256, rerankPerQuery = rerank).df)
    val recall = recallOf(got, exactTop10)
    assert(recall >= 0.8, f"hamming recall@10 $recall%.3f < 0.8")
  }

  test("multi-probe LSH reaches recall@10 >= 0.7") {
    val emb = table("embeddings")
    val got = topkPairs(emb.lshCosineTopK(emb.df.where("vec_id < 5"),
      "vec_id", "embedding", 10).df)
    val recall = recallOf(got, exactTop10)
    assert(recall >= 0.7, f"lsh recall@10 $recall%.3f < 0.7")
  }

  test("k-means IVF reaches recall@10 >= 0.5 at 25% cell probe") {
    val emb = table("embeddings")
    val got = topkPairs(emb.ivfCosineTopK(emb.df.where("vec_id < 5"),
      "vec_id", "embedding", 10, nlist = 16, nprobe = 4).df)
    val recall = recallOf(got, exactTop10)
    assert(recall >= 0.5, f"ivf recall@10 $recall%.3f < 0.5")
  }

  test("saved IVF index search keeps the recall floor and reproduces the one-shot path") {
    val emb = table("embeddings")
    val idx = emb.ivfIndex("vec_id", "embedding", nlist = 16)
    val queries = Chain(spark, "q", emb.df.where("vec_id < 5"))
    val viaIndex = queries.searchIvfIndex(idx.df, "vec_id", "embedding", 10, nprobe = 4).df
    val recall = recallOf(topkPairs(viaIndex), exactTop10)
    assert(recall >= 0.5, f"ivf-index recall@10 $recall%.3f < 0.5")
    // same trained centroids + same assignment logic → the saved-index
    // probe must reproduce the one-shot IVF path EXACTLY, not just in recall
    val oneShot = emb.ivfCosineTopK(emb.df.where("vec_id < 5"),
      "vec_id", "embedding", 10, nlist = 16, nprobe = 4).df
    def ranked(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ranked(viaIndex) == ranked(oneShot))
  }

  test("Bernoulli sample size stays within 4-sigma binomial bounds") {
    val li = table("lineitem")
    val n = li.df.count()
    val f = 0.1
    val sampled = li.sampleRows(f).df.count()
    val sigma = math.sqrt(n * f * (1 - f))
    val lo = n * f - 4 * sigma
    val hi = n * f + 4 * sigma
    assert(sampled >= lo && sampled <= hi,
      s"sample of $n rows at $f gave $sampled, outside [$lo, $hi]")
  }

  test("approx_agg distinct within 15% HLL error, percentiles within 1%") {
    val li = table("lineitem")
    val approx = li.approxAgg(Seq("l_returnflag"), "l_extendedprice").df
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = li.df.groupBy("l_returnflag")
      .agg(countDistinct(col("l_extendedprice")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (flag, (d, p50, p95)) =>
      val (ad, ap50, ap95) = approx(flag)
      assert(math.abs(ad - d).toDouble / d <= 0.15,
        s"$flag approx distinct $ad vs exact $d beyond HLL bound")
      assert(math.abs(ap50 - p50) / p50 <= 0.01, s"$flag p50 $ap50 vs $p50")
      assert(math.abs(ap95 - p95) / p95 <= 0.01, s"$flag p95 $ap95 vs $p95")
    }
  }

  test("incremental dedup drops >=90% of strong cross-split near-dups, never a clean doc") {
    // even ids = indexed corpus, odd ids = batch (the q_dedup_incremental split)
    val docs = table("documents")
    val idx = docs.filterRows(Seq("doc_id % 2 = 0"))
      .minhashIndex("doc_id", "text", shingleWords = 2, numHashes = 32, bands = 8)
    val survivors = docs.filterRows(Seq("doc_id % 2 = 1"))
      .dedupAgainstIndex(idx.df, "doc_id", "text",
        shingleWords = 2, numHashes = 32, bands = 8, estThreshold = 0.5)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    // ground truth from the exact bigram-Jaccard pairs: a batch doc is a
    // true dup iff it pairs across the split at j >= 0.8; clean iff it has
    // no cross-split pair at all (j >= 0.5 universe)
    def crossSplit(j: Double) = exactNgramPairs.collect {
      case ((a, b), s) if s >= j && a % 2 != b % 2 =>
        if (a % 2 == 1) a else b
    }.toSet
    val trueDups = crossSplit(0.8)
    val anyPair = crossSplit(0.0)
    val allBatch = docs.filterRows(Seq("doc_id % 2 = 1"))
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trueDups.nonEmpty, "test corpus must plant cross-split near-dups")
    val dropped = allBatch -- survivors
    val caught = (trueDups & dropped).size.toDouble / trueDups.size
    assert(caught >= 0.9, f"incremental dedup caught $caught%.3f of strong cross-split dups < 0.9")
    val falseDrops = dropped -- anyPair
    assert(falseDrops.isEmpty,
      s"docs with no cross-split near-dup were dropped: ${falseDrops.toSeq.sorted.take(5)}")
  }

  test("HLL sketch columns: split/merge invariant and within error of exact distinct") {
    val li = table("lineitem")
    // build fine-grained sketches, merge to a coarser rollup
    val fine = li.distinctSketches(Seq("l_returnflag", "l_linestatus"), "l_extendedprice")
    val merged = fine.mergeDistinctSketches(Seq("l_returnflag"), "l_extendedprice_sketch")
      .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // split/merge agreement: the register-wise union is lossless in dense
    // mode; sparse-mode transitions may differ by a fraction of a percent,
    // so gate agreement with the direct single-pass path at 2%
    val direct = li.distinctSketches(Seq("l_returnflag"), "l_extendedprice")
      .mergeDistinctSketches(Seq("l_returnflag"), "l_extendedprice_sketch")
      .df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (flag, d) =>
      assert(math.abs(merged(flag) - d).toDouble / d <= 0.02,
        s"$flag merged ${merged(flag)} vs direct $d beyond 2%")
    }
    // and the estimate is within HLL error of the exact distinct count
    val exact = li.df.groupBy("l_returnflag")
      .agg(countDistinct(col("l_extendedprice")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, d) =>
      val e = merged(flag)
      assert(math.abs(e - d).toDouble / d <= 0.05,
        s"$flag sketch estimate $e vs exact $d beyond 5% (lgK=12 ~ 1.6% stderr)")
    }
  }

  test("KLL sketch columns: split/merge agreement and rank-error bound vs exact percentiles") {
    val li = table("lineitem")
    // build fine-grained quantile sketches, merge to a coarser rollup
    val merged = li.percentileSketches(Seq("l_returnflag", "l_linestatus"), "l_extendedprice")
      .mergePercentileSketches(Seq("l_returnflag"), "l_extendedprice_qsketch", Seq(0.5, 0.95))
      .df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // merged estimates must sit within the k=200 normalized rank error
    // (~1.65%, 3x slack for the merge) of the EXACT quantiles by rank:
    // compare through the exact value at rank p +- eps, not value distance
    val eps = 0.05
    Seq(0.5 -> 1, 0.95 -> 2).foreach { case (p, fieldIdx) =>
      val exact = li.df.groupBy("l_returnflag")
        .agg(expr(s"percentile(l_extendedprice, ${p - eps})").as("lo"),
          expr(s"percentile(l_extendedprice, ${math.min(1.0, p + eps)})").as("hi"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      exact.foreach { case (flag, (lo, hi)) =>
        val got = if (fieldIdx == 1) merged(flag)._1 else merged(flag)._2
        assert(got >= lo && got <= hi,
          f"$flag p$p sketch value $got%.2f outside exact rank band [$lo%.2f, $hi%.2f]")
      }
    }
    // all-null/empty groups yield null, not a crash
    val empty = Chain(spark, "e",
      li.df.where("l_extendedprice IS NULL").select("l_returnflag", "l_extendedprice"))
      .percentileSketches(Seq("l_returnflag"), "l_extendedprice").df
    assert(empty.count() == 0)
  }

  test("dedupNear with minhash candidates drops near-dups without false drops") {
    val docs = table("documents")
    val kept = docs.dedupNear("doc_id", "text", n = 2, threshold = 0.8,
      candidates = "minhash")
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.df.select("doc_id").collect().map(_.getLong(0)).toSet
    val dropped = all -- kept
    // no false drops: every dropped doc has SOME exact near-dup pair
    val paired = exactNgramPairs.keySet.flatMap(p => Set(p._1, p._2))
    assert((dropped -- paired).isEmpty,
      s"docs with no near-dup were dropped: ${(dropped -- paired).toSeq.sorted.take(5)}")
    // recall vs the exact-candidate variant: minhash must shrink the corpus
    // by at least 90% as much
    val keptExact = docs.dedupNear("doc_id", "text", n = 2, threshold = 0.8)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    val droppedExact = all -- keptExact
    assert(droppedExact.nonEmpty, "test corpus must contain strong near-dups")
    val agree = (dropped & droppedExact).size.toDouble / droppedExact.size
    assert(agree >= 0.9, f"minhash-candidate dedup drops $agree%.3f of the exact drops < 0.9")
    // explicit banding override plumbs through: a wider signature with
    // 4-row bands (curve midpoint 0.5) must be at least as aggressive
    val keptWide = docs.dedupNear("doc_id", "text", n = 2, threshold = 0.8,
      candidates = "minhash", numHashes = 64, bands = 16)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    val agreeWide = ((all -- keptWide) & droppedExact).size.toDouble / droppedExact.size
    assert(agreeWide >= 0.9,
      f"explicit 64x16 banding drops $agreeWide%.3f of the exact drops < 0.9")
  }

  test("semantic dedup: ivf candidates track exact drops, nassign is the recall dial") {
    val emb = table("embeddings")
    val all = emb.df.select("vec_id").collect().map(_.getLong(0)).toSet
    def kept(cand: String, nassign: Int = 2): Set[Long] =
      emb.dedupNearEmbedding("vec_id", "embedding", 0.4,
        candidates = cand, nassign = nassign)
        .df.select("vec_id").collect().map(_.getLong(0)).toSet
    val dropExact = all -- kept("exact")
    assert(dropExact.nonEmpty, "test embeddings must contain cosine near-dups")
    // nassign=4: near-total agreement with the exact pass (measured 0.985)
    val drop4 = all -- kept("ivf", nassign = 4)
    val agree4 = (drop4 & dropExact).size.toDouble / dropExact.size
    assert(agree4 >= 0.9, f"ivf nassign=4 drop agreement $agree4%.3f < 0.9")
    // within-cell candidates can only ever VERIFY true pairs — no false drops
    assert((drop4 -- dropExact).isEmpty, "ivf candidates must never drop a non-near-dup")
    // monotone recall in nassign
    val drop2 = all -- kept("ivf", nassign = 2)
    assert(drop2.subsetOf(drop4) || drop2.size <= drop4.size,
      s"more assigned cells must not lose drops: ${drop2.size} vs ${drop4.size}")
    val e = intercept[IllegalArgumentException](
      emb.dedupNearEmbedding("vec_id", "embedding", 0.4, candidates = "nope").df)
    assert(e.getMessage.contains("candidates"))
  }

  test("winsorize: NaN never ranks, never becomes a bound, passes through unclamped") {
    import spark.implicits._
    import graft.core.Chain
    // ten real values 1..10 plus a NaN: with p=(0.2,0.8) the bounds come
    // from the REAL values only (nearest-rank over n=10: lo = rank
    // floor(0.2·9)+1 = 2 → 2.0, hi = rank ceil(0.8·9)+1 = 9 → 9.0);
    // unguarded, the NaN would occupy the top rank and poison _w_hi
    val df = ((1 to 10).map(i => (i.toLong, i.toDouble)) :+ (11L, Double.NaN))
      .toDF("id", "x")
    def check(out: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val m = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(m(1L) == 2.0, s"$tag: low tail must clamp to 2, got ${m(1L)}")
      assert(m(10L) == 9.0, s"$tag: high tail must clamp to 9 (NaN must not be the bound), got ${m(10L)}")
      assert(m(5L) == 5.0, s"$tag: interior untouched")
      assert(m(11L).isNaN, s"$tag: NaN passes through unclamped")
    }
    check(Chain(spark, "wn", df).winsorize("x", Nil, 0.2, 0.8).df
      .select("id", "x", "x_wins"), "exact")
    // the sketch face has KLL's own rank convention — assert the CONTRACT:
    // NaN passes through, and the upper bound is a real value (clamp bites)
    val ms = Chain(spark, "wn", df).winsorizeSketch("x", Nil, 0.2, 0.8).df
      .select("id", "x", "x_wins").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ms(11L).isNaN, "sketch: NaN passes through unclamped")
    assert(!ms(10L).isNaN && ms(10L) < 10.0,
      s"sketch: NaN must not become the upper bound, got ${ms(10L)}")
    // the rendered exact SQL face agrees (engine-portable NaN handling)
    df.createOrReplaceTempView("wn_nan_src")
    check(spark.sql(Chain(spark, "wn_nan_src", df).winsorize("x", Nil, 0.2, 0.8).sql())
      .select("id", "x", "x_wins"), "sql")
  }

  test("winsorize: sketch face tracks the exact nearest-rank clamp") {
    import org.apache.spark.sql.functions._
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey")
    val exact = table("lineitem")
      .winsorize("l_extendedprice", Seq("l_returnflag"), 0.05, 0.95).df
      .select((keys.map(col) :+ col("l_extendedprice").as("raw") :+
        col("l_extendedprice_wins").as("e")): _*)
    val sk = table("lineitem")
      .winsorizeSketch("l_extendedprice", Seq("l_returnflag"), 0.05, 0.95).df
      .select((keys.map(col) :+ col("l_extendedprice_wins").as("s")): _*)
    val j = exact.join(sk, keys).cache()
    val n = j.count().toDouble
    // the clamp actually bites both tails
    assert(j.where(col("e") < col("raw")).count() > 0)
    assert(j.where(col("e") > col("raw")).count() > 0)
    // a bound off by even one rank changes the clamp VALUE of every row in
    // that tail, so value-disagreement is not the right gate — the KLL
    // guarantee is on RANKS: the fraction of rows each face clamps must
    // agree within the sketch's normalized rank error (±1.65% at k=200;
    // 3σ margin per side)
    val clampLoE = j.where(col("e") > col("raw")).count() / n
    val clampLoS = j.where(col("s") > col("raw")).count() / n
    val clampHiE = j.where(col("e") < col("raw")).count() / n
    val clampHiS = j.where(col("s") < col("raw")).count() / n
    assert(math.abs(clampLoE - clampLoS) <= 0.05,
      f"low-tail clamp fraction: exact $clampLoE%.3f vs sketch $clampLoS%.3f")
    assert(math.abs(clampHiE - clampHiS) <= 0.05,
      f"high-tail clamp fraction: exact $clampHiE%.3f vs sketch $clampHiS%.3f")
    // rows well inside the bounds are untouched by BOTH faces
    assert(j.where(col("e") === col("raw") && col("s") =!= col("raw")).count() / n <= 0.05)
    // and where they disagree, the sketch value stays inside the raw range
    val stats = j.agg(min("raw").as("lo"), max("raw").as("hi")).head()
    val out = j.where(col("s") < stats.getDouble(0) || col("s") > stats.getDouble(1)).count()
    assert(out == 0, "sketch clamp must never leave the raw value range")
    j.unpersist()
  }

  test("robust scaler: sketch-face center/spread sit within KLL rank error of exact") {
    import org.apache.spark.sql.functions._
    def recover(df: org.apache.spark.sql.DataFrame, scaled: String): Map[String, (Double, Double)] = {
      // two rows with distinct raw values solve (median, scale):
      // s = (x - m)/q  =>  q = (x1 - x2)/(s1 - s2), m = x1 - s1*q
      df.select(col("l_returnflag"), col("l_extendedprice").cast("double").as("x"), col(scaled).as("s"))
        .collect().groupBy(_.getString(0)).map { case (g, rs) =>
          val Seq(a, b) = rs.sortBy(_.getDouble(1)).toSeq.distinctBy(_.getDouble(1)).take(2)
          val q = (a.getDouble(1) - b.getDouble(1)) / (a.getDouble(2) - b.getDouble(2))
          g -> (a.getDouble(1) - a.getDouble(2) * q, q)
        }
    }
    val exact = recover(table("lineitem")
      .robustScaler("l_extendedprice", Seq("l_returnflag")).df, "l_extendedprice_rscaled")
    val sketch = recover(table("lineitem")
      .robustScalerSketch("l_extendedprice", Seq("l_returnflag")).df, "l_extendedprice_rscaled")
    val raw = table("lineitem").df
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("x"))
      .collect().groupBy(_.getString(0)).map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    exact.keys.foreach { g =>
      val (mS, qS) = sketch(g); val (_, qE) = exact(g)
      val xs = raw(g)
      // the sketch median's EXACT rank must sit inside the KLL band
      val rank = xs.count(_ <= mS).toDouble / xs.length
      assert(rank >= 0.43 && rank <= 0.57,
        f"group $g: sketch median rank $rank%.3f outside the KLL band")
      // spread: both quartiles within rank error -> IQR ratio stays near 1
      assert(qS / qE > 0.7 && qS / qE < 1.4,
        f"group $g: sketch IQR drifted: sketch $qS%.2f vs exact $qE%.2f")
    }
  }

  test("logistic regression: deterministic IRLS, beats the null model, AUC floor") {
    import org.apache.spark.sql.functions._
    val feat = table("documents").df
      .withColumn("f_len", length(col("text")).cast("double"))
      .withColumn("f_tok", size(graft.ext.TextOps.tokens(col("text"))).cast("double"))
    // deterministic standardized label: long docs are "quality" — monotone
    // in a feature the model sees, so a working fit must separate it
    val stats = feat.agg(avg("f_len").as("m"), stddev_pop("f_len").as("s")).head()
    val (m, sd) = (stats.getDouble(0), stats.getDouble(1))
    val labeled = feat.withColumn("label",
      (((col("f_len") - lit(m)) / lit(sd)) > 0).cast("int"))
    def fit(): Array[(String, Double)] =
      Chain(spark, "docs_lab", labeled)
        .logisticRegression("label", Seq("f_len", "f_tok"), iters = 8)
        .df.orderBy("idx").collect().map(r => (r.getString(1), r.getDouble(2)))
    val model = fit()
    assert(model.map(_._1).toSeq == Seq("(intercept)", "f_len", "f_tok"))
    // exact-decimal accumulation: identical coefficients under any partitioning
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try assert(fit().sameElements(model), "coefficients depend on partitioning")
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
    // scoring face: AUC over the training labels (monotone signal → ~1)
    val modelDf = Chain(spark, "docs_lab", labeled)
      .logisticRegression("label", Seq("f_len", "f_tok"), iters = 8).df
    val scored = Chain(spark, "docs_lab", labeled)
      .scoreLogistic(modelDf, "q").df
      .select(col("q_prob"), col("label")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    val auc = pos.iterator.map(p =>
      neg.count(n => n < p) + 0.5 * neg.count(n => n == p)).sum /
      (pos.length.toDouble * neg.length)
    assert(auc >= 0.95, f"AUC $auc%.3f < 0.95")
    // fitted model beats the intercept-only (null) log-loss
    val p0 = pos.length.toDouble / scored.length
    val nullLoss = -(p0 * math.log(p0) + (1 - p0) * math.log(1 - p0))
    val eps = 1e-12
    val fitLoss = scored.iterator.map { case (p, y) =>
      -(y * math.log(p + eps) + (1 - y) * math.log(1 - p + eps))
    }.sum / scored.length
    assert(fitLoss < nullLoss, f"fit log-loss $fitLoss%.4f >= null $nullLoss%.4f")
  }

  test("pca: orthonormal axes, explained-variance and projected-recall floors") {
    import org.apache.spark.sql.functions._
    val emb = table("embeddings")
    val model = emb.pcaFit("vec_id", "embedding", dim = 32)
    val rows = model.df.orderBy("_pc").collect()
    assert(rows.length == 32)
    // axes orthonormal to FP precision
    val axes = rows.map(_.getSeq[Double](3).toArray)
    for (i <- axes.indices; j <- i until axes.length) {
      val dot = axes(i).zip(axes(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"axes ${i}x${j} dot = $dot, expected $expect")
    }
    // eigenvalues descending; 32 of 64 dims explain most of the variance
    // (measured 0.651 on the synthetic embeddings; floor with margin)
    val eigvals = rows.map(_.getDouble(1))
    assert(eigvals.zip(eigvals.tail).forall { case (a, b) => a >= b })
    val explained = rows.map(_.getDouble(2)).sum
    assert(explained >= 0.55, f"explained variance $explained%.3f < 0.55")
    // exact search in the 32-dim projected space still finds the full-space
    // top-10 (measured 0.49; floor with margin). The production pattern is
    // projected-space prescan + exact rerank, which only needs the true
    // neighbors to reach the candidate pool — this floor is the harder ask.
    val proj = emb.pcaProject(model.df, "embedding", "emb_p")
    assert(proj.df.where(col("emb_p").isNull).count() == 0)
    val qs = emb.df.where("vec_id < 5")
    val qsProj = proj.df.where("vec_id < 5").drop("embedding")
      .withColumnRenamed("emb_p", "embedding")
    def topk(chain: Chain, queries: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      chain.cosineTopK(queries, "vec_id", "embedding", 10)
        .df.collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = topk(emb, qs)
    val inProj = topk(Chain(spark, "proj",
      proj.df.drop("embedding").withColumnRenamed("emb_p", "embedding")), qsProj)
    val recalls = exact.keys.map(q => (inProj(q) & exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.35, f"pca-32 projected recall@10 $mean%.3f < 0.35")
    // dim-mismatch rows degrade to null, not a scan kill
    val malformed = Chain(spark, "bad",
      Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    assert(malformed.pcaProject(model.df, "embedding", "p")
      .df.where(col("p").isNull).count() == 1)
    // persistent-artifact round trip: saved model projects bit-identically
    spark.sql("DROP TABLE IF EXISTS pca_model_t")
    model.save("pca_model_t", "TABLE", overwrite = true)
    val viaSaved = emb.pcaProject(spark.table("pca_model_t"), "embedding", "emb_p")
      .df.selectExpr("vec_id", "emb_p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val direct = proj.df.selectExpr("vec_id", "emb_p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaSaved == direct, "saved-model projection must be bit-identical")
  }

  test("int8 quantization: bounded reconstruction error, recall@10 gated") {
    import org.apache.spark.sql.functions._
    val emb = table("embeddings")
    val deq = emb.quantizeEmbeddings("embedding")
      .dequantizeEmbeddings("embedding_q", "embedding_qscale", "emb_hat")
    // per-coordinate reconstruction error <= scale/2, exactly as documented
    val bad = deq.df.select(explode(zip_with(col("embedding"), col("emb_hat"),
      (a, b) => abs(a.cast("double") - b.cast("double")))).as("err"),
      (col("embedding_qscale") / 2 + lit(1e-7)).as("bound"))
      .where(col("err") > col("bound")).count()
    assert(bad == 0, s"$bad coordinates exceed the scale/2 reconstruction bound")
    // ANN over the dequantized corpus recalls the exact top-10
    val qs = emb.df.where("vec_id < 5")
    def top10(chain: Chain, vc: String): Map[Long, Set[Long]] =
      chain.cosineTopK(qs, "vec_id", vc, 10)
        .df.collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = top10(emb, "embedding")
    val approx = top10(Chain(spark, "dq",
      deq.df.drop("embedding").withColumnRenamed("emb_hat", "embedding")), "embedding")
    val recalls = exact.keys.map(q => (approx(q) & exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, f"int8 recall@10 $mean%.3f < 0.85")
  }

  test("incremental semantic dedup: ivf-index probe drops only true near-dups, recall gated") {
    import org.apache.spark.sql.functions.col
    val emb = table("embeddings")
    val idxSide = Chain(spark, "e", emb.df.where("vec_id % 2 = 0"))
    val batch = Chain(spark, "b", emb.df.where("vec_id % 2 = 1"))
    val idx = idxSide.ivfIndex("vec_id", "embedding", nlist = 16)
    val kept = batch.dedupAgainstIvfIndex(idx.df, "vec_id", "embedding",
      threshold = 0.4, nprobe = 8)
      .df.select("vec_id").collect().map(_.getLong(0)).toSet
    val batchIds = batch.df.select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = batchIds -- kept
    // exact cross-split truth: odd ids with cosine >= 0.4 to SOME even id
    val truth = emb.embeddingCosinePairs("vec_id", "embedding", 0.4)
      .df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 2 == 0) != (b % 2 == 0) }
      .flatMap { case (a, b) => Seq(a, b) }.filter(_ % 2 == 1).toSet
    // every drop is exact-cosine verified against an indexed vector — no
    // false drops, by construction
    assert((dropped -- truth).isEmpty,
      s"probe dropped non-near-dups: ${(dropped -- truth).take(5)}")
    assert(truth.nonEmpty, "test embeddings must contain cross-split near-dups")
    val recall = (dropped & truth).size.toDouble / truth.size
    assert(recall >= 0.7, f"ivf-probe drop recall $recall%.3f < 0.7 (nprobe=8/nlist=16)")
  }

  test("frequent-items sketches: exact under capacity, bounds honest and split/merge stable beyond it") {
    val li = table("lineitem")
    // EXACT regime: capacity 64 >> the handful of distinct line numbers —
    // the rolled-up top-k must equal the plain GROUP-BY-count top-k exactly
    val got = li.freqSketches(Seq("l_returnflag"), "l_linenumber", maxMapSize = 64)
      .mergeFreqSketches(Seq.empty, "l_linenumber_fsketch", k = 3)
      .df.collect().map(r => (r.getAs[String]("item"), r.getAs[Long]("est"),
        r.getAs[Int]("rank"))).toSeq.sortBy(_._3)
    val exact = li.df.groupBy("l_linenumber").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1))
      .sortBy { case (m, n) => (-n, m) }.take(3)
    assert(got.map(t => (t._1, t._2)) == exact.toSeq,
      s"exact-regime top-3 must equal GROUP BY counts: got $got expected $exact")
    // APPROXIMATE regime: capacity 8 << ~2000 distinct suppkey values.
    // NO_FALSE_NEGATIVES + Misra-Gries bounds: the true count of every
    // returned item must lie within [lb, ub], and the heaviest TRUE item
    // must be recovered once its count clears the error band (here we
    // plant a dominant key by unioning duplicates of one suppkey)
    val heavy = spark.range(4000).select(lit(999999L).as("l_suppkey"))
    val planted = Chain(spark, "li",
      li.df.select("l_suppkey").unionAll(heavy))
    val approx = planted.freqSketches(Seq.empty, "l_suppkey", maxMapSize = 8)
      .mergeFreqSketches(Seq.empty, "l_suppkey_fsketch", k = 5).df.collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est"),
        r.getAs[Long]("lb"), r.getAs[Long]("ub")))
    val truth = planted.df.groupBy("l_suppkey").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    approx.foreach { case (item, _, lb, ub) =>
      val t = truth(item)
      assert(t >= lb && t <= ub, s"item $item true $t outside [$lb, $ub]")
    }
    assert(approx.map(_._1).contains("999999"),
      s"planted heavy hitter must be recovered, got ${approx.map(_._1).toSeq}")
  }

  test("bm25 ranking rank-correlates with raw tf-idf and self-retrieves on clean fixtures") {
    // (a) rank agreement on the sf corpus: both scorings rank the SAME
    // candidate set (docs sharing >=1 query term); the orderings must be
    // strongly Spearman-correlated even though bm25's idf/saturation/
    // length normalization legitimately reorders individual documents
    val docs = table("documents")
    val queries = docs.filterRows(Seq("doc_id < 3"))
    def ranked(scoring: String): Map[Long, Seq[Long]] =
      docs.searchTfidf(queries, "doc_id", "text", "doc_id", "text", k = 100000,
        scoring = scoring)
        .df.orderBy("query_id", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSeq }
    val raw = ranked("tfidf")
    val bm25 = ranked("bm25")
    assert(raw.keySet == bm25.keySet && raw.keySet.size == 3)
    for (q <- raw.keySet) {
      assert(raw(q).toSet == bm25(q).toSet,
        s"same candidate set for query $q under both scorings")
      val n = raw(q).size
      val rawRank = raw(q).zipWithIndex.toMap
      val ds = bm25(q).zipWithIndex.map { case (doc, i) =>
        val d = (rawRank(doc) - i).toDouble; d * d
      }
      val rho = 1.0 - 6.0 * ds.sum / (n.toDouble * (n.toDouble * n - 1.0))
      assert(rho >= 0.5, s"Spearman(raw, bm25) for query $q is $rho over $n docs")
    }
    // (b) on a clean fixture with distinct short docs, bm25 self-retrieves
    import spark.implicits._
    val clean = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota"), (4L, "kappa lambda mu")).toDF("doc_id", "text")
    val cq = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val self = Chain(spark, "clean", clean)
      .searchTfidf(Chain(spark, "cq", cq), "doc_id", "text", "doc_id", "text",
        k = 1, scoring = "bm25")
      .df.collect()
    assert(self.length == 1 && self(0).getLong(1) == 1L)
  }

  test("rolling fingerprint collides on >=90% of near-dups, never on unrelated docs") {
    // bottom-1 min-window sketch: P[fp equal] ≈ window-set Jaccard, so
    // exact near-dup pairs (j >= 0.9) must nearly all collide and the
    // ~125k non-dup pairs must not (64-bit hash space)
    val fp = table("documents").rollingFingerprintCol("text", 32).df
      .select("doc_id", "text_rfp").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strong = exactNgramPairs.filter(_._2 >= 0.9).keySet
    assert(strong.nonEmpty)
    val hit = strong.count { case (a, b) => fp(a) == fp(b) }
    assert(hit.toDouble / strong.size >= 0.9,
      s"only $hit of ${strong.size} near-dup pairs share a fingerprint")
    val ids = fp.keys.toArray.sorted
    var falseColl = 0
    for (i <- ids.indices; j <- (i + 1) until ids.length)
      if (!exactNgramPairs.contains((ids(i), ids(j))) && fp(ids(i)) == fp(ids(j)))
        falseColl += 1
    assert(falseColl == 0, s"$falseColl unrelated pairs share a fingerprint")
  }
}
