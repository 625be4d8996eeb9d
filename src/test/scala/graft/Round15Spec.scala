package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-15 batch: the distributed prefix-scan regime under
  * the loader-prep family (no more single-task windows), conditional
  * IVFADC probe broadcast, and the lint rule that catches the retired
  * shape.
  */
class Round15Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- PrefixScan: the zipWithIndex-offset regime generalized ----------

  test("PrefixScan matches the window formulation across partition boundaries") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    // tiny fixture: AQE would coalesce the range sort to ONE partition and
    // the boundary-offset logic would never run; at real scale partitions
    // stay byte-sized and the coalesce is welcome
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // skewed groups + a null group + null weights, shuffled input order
      val data = (0 until 200).map { i =>
        val g = if (i % 7 == 0) null
        else if (i < 120) "a" else if (i < 180) "b" else "c"
        val w: java.lang.Long =
          if (i % 11 == 0) null else java.lang.Long.valueOf((i % 5) + 1L)
        (i.toLong, g, w)
      }
      val df = data.toDF("id", "g", "w").repartition(7)
      val got = graft.core.PrefixScan.exclusivePrefixSum(
        df, Seq(col("g")), Seq(col("id")), col("w"), "cum")
      // the sorted relation spans many partitions, so group runs MUST
      // cross boundaries — the offset reconstitution is live, not trivial
      assert(got.rdd.getNumPartitions > 4,
        s"expected a multi-partition sort, got ${got.rdd.getNumPartitions}")
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val want = df.withColumn("cum", coalesce(sum(col("w")).over(win), lit(0L)))
      assert(rows(got) == rows(want))
      // ungrouped face: one global running sum, same equivalence
      val got0 = graft.core.PrefixScan.exclusivePrefixSum(
        df, Nil, Seq(col("id")), col("w"), "cum")
      val win0 = org.apache.spark.sql.expressions.Window
        .partitionBy().orderBy(col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val want0 = df.withColumn("cum", coalesce(sum(col("w")).over(win0), lit(0L)))
      assert(rows(got0) == rows(want0))
      // single-row groups interior to partitions get offset 0
      val tiny = Seq((1L, "x", 5L), (2L, "y", 7L)).toDF("id", "g", "w")
      val gotT = graft.core.PrefixScan.exclusivePrefixSum(
        tiny, Seq(col("g")), Seq(col("id")), col("w"), "cum")
      assert(gotT.collect().map(_.getLong(3)).toSet == Set(0L))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("PrefixScan equals the window formulation across randomized shapes") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      for (seed <- Seq(7, 23, 91, 404)) {
        val rnd = new scala.util.Random(seed)
        val nGroups = 1 + rnd.nextInt(6)
        val n = 50 + rnd.nextInt(300)
        val data = (0 until n).map { _ =>
          val g = if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(nGroups)}"
          val w: java.lang.Long =
            if (rnd.nextInt(12) == 0) null else java.lang.Long.valueOf(rnd.nextInt(9).toLong)
          (rnd.nextLong(), g, w) // random ids: shuffled input, tie-free order
        }
        val df = data.toDF("id", "g", "w").repartition(5)
        val got = graft.core.PrefixScan.exclusivePrefixSum(
          df, Seq(col("g")), Seq(col("id")), col("w"), "cum")
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val want = df.withColumn("cum", coalesce(sum(col("w")).over(win), lit(0L)))
        assert(rows(got) == rows(want), s"seed $seed (n=$n, groups=$nGroups)")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("PrefixScan completes on empty frames and rejects internal-name collisions") {
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "g", "w")
    assert(graft.core.PrefixScan.exclusivePrefixSum(
      empty, Seq(col("g")), Seq(col("id")), col("w"), "cum").count() == 0)
    intercept[IllegalArgumentException] {
      graft.core.PrefixScan.exclusivePrefixSum(
        Seq((1L, 2L)).toDF("id", "_ps_w0"), Nil, Seq(col("id")), col("id"), "cum")
    }
  }

  // ---- loader-prep family: the single-task windows are gone -------------

  private def windowsIn(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes every stage
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: org.apache.spark.sql.execution.window.WindowExec => n += 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  test("pack/interleave plans carry NO WindowExec (grouped, ungrouped, token face) and lint clean") {
    val docs = (0 until 60).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "zh", s"doc text $i body", (i % 9) + 1L))
      .toDF("doc_id", "lang", "text", "n_tok")
    val faces = Seq(
      Chain(spark, "d", docs).packSequences("n_tok", 10L, Seq("doc_id"), Seq("lang")).df,
      Chain(spark, "d", docs).packSequences("n_tok", 10L, Seq("doc_id")).df,
      Chain(spark, "d", docs).packSequencesByTokens("text", 10L, Seq("doc_id")).df,
      Chain(spark, "d", docs).interleaveByWeight("lang",
        Seq("en" -> 3L, "zh" -> 1L), Seq("doc_id")).df)
    faces.foreach { f =>
      assert(windowsIn(f) == 0, "a WindowExec survived the prefix-scan rewrite")
      graft.core.ScaleLint.assertSafe(f)
    }
  }

  // ---- IVFADC probe joins: size-gated broadcast ------------------------

  // the probe join is the only _cid-conditioned equi-join in these plans;
  // the bounded centroid broadcast arrives via a condition-free crossJoin
  // and must not satisfy this detector
  private def probeHinted(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.references.exists(_.name == "_cid")) =>
        Seq(j.hint.leftHint, j.hint.rightHint).flatten
          .exists(_.strategy.contains(
            org.apache.spark.sql.catalyst.plans.logical.BROADCAST))
    }.exists(identity)

  test("IVF probe joins broadcast small batches, fall back to the shuffled _cid equi-join on large ones") {
    // batches must be LocalRelations: plan statistics are exact there,
    // while RDD-backed frames report the conservative maximum and are
    // never force-broadcast (pinned below)
    val local = Chain(spark, "pq15", SparkEntry.embFixtureDf(spark)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toSeq)).toSeq
      .toDF("vec_id", "embedding"))
    val model = local.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10)
    val idx = local.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val queries = Chain(spark, "q15", local.df.where("vec_id < 4"))
    val lattice = local
    def search() = queries.searchIvfPq(model.df, idx.df, "vec_id", "embedding",
      k = 5, nprobe = 4).df
    def screen() = lattice.dedupAgainstIvfPqIndex(idx.df, model.df,
      "vec_id", "embedding", maxDist = 0.05, nprobe = 2).df
    // default threshold (10 MB): the tiny batch is force-broadcast —
    // the index scan is pruned before any shuffle
    val hintedSearch = search()
    val hintedScreen = screen()
    assert(probeHinted(hintedSearch), "small batch should carry the broadcast hint")
    assert(probeHinted(hintedScreen), "small screen batch should carry the broadcast hint")
    val wantSearch = rows(hintedSearch)
    val wantScreen = rows(hintedScreen)
    // a batch whose estimated probe size exceeds 8x the engine threshold
    // must NOT be force-broadcast (a 10M-row ingest screen would OOM);
    // results are strategy-independent
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val shuffledSearch = search()
      val shuffledScreen = screen()
      assert(!probeHinted(shuffledSearch), "oversized batch must not be force-broadcast")
      assert(!probeHinted(shuffledScreen), "oversized screen must not be force-broadcast")
      assert(rows(shuffledSearch) == wantSearch, "results must not depend on the join strategy")
      assert(rows(shuffledScreen) == wantScreen)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // RDD-backed lineage (localCheckpoint/createDataFrame) reports the
    // conservative defaultSizeInBytes maximum — such batches are never
    // force-broadcast either; AQE recovers a broadcast at runtime
    val rddQueries = Chain(spark, "q15r",
      SparkEntry.embFixtureDf(spark).where("vec_id < 4"))
    val s2 = rddQueries.searchIvfPq(model.df, idx.df, "vec_id", "embedding",
      k = 5, nprobe = 4).df
    assert(!probeHinted(s2), "unknown-stats batch must not be force-broadcast")
    assert(rows(s2) == wantSearch)
  }

  test("review fixes: non-injective filters prove nothing; probes broadcast with auto-broadcast disabled; checkpoints release; integral tokens enforced") {
    // a pushed-down non-injective predicate (k % 10 = 3) bounds NOTHING:
    // k still takes unboundedly many values — the lint must stay quiet
    val docs = table("documents").df
    val modFiltered = docs
      .where(col("doc_id") % 10 === 3)
      .withColumn("_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("n_chars"))))
    assert(!graft.core.ScaleLint.lint(modFiltered)
      .exists(_.rule == "low-domain-window-key"),
      "k % 10 = 3 must not read as a domain bound")
    // broadcast disabled (threshold -1, the OOM-protection config): a
    // small probe batch must STILL be hinted — AQE cannot rescue it there
    val local = Chain(spark, "pb15", SparkEntry.embFixtureDf(spark)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toSeq)).toSeq
      .toDF("vec_id", "embedding"))
    val model = local.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10)
    val idx = local.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val s = Chain(spark, "pb15q", local.df.where("vec_id < 4"))
        .searchIvfPq(model.df, idx.df, "vec_id", "embedding", k = 5, nprobe = 4).df
      assert(probeHinted(s),
        "small batch must keep the probe hint when auto-broadcast is disabled")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // releaseCheckpoints finds the checkpoint buried one dependency down
    val packDocs = Seq((1L, "en", 3L), (2L, "en", 2L), (3L, "zh", 4L))
      .toDF("doc_id", "lang", "n_tok")
    val packed = Chain(spark, "rc15", packDocs)
      .packSequences("n_tok", 5L, Seq("doc_id"), Seq("lang"))
    def persistedDeps(rdd: org.apache.spark.rdd.RDD[_]): Int = {
      val here = if (rdd.getStorageLevel !=
        org.apache.spark.storage.StorageLevel.NONE) 1 else 0
      here + rdd.dependencies.map(d => persistedDeps(d.rdd)).sum
    }
    val planRdds = packed.df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    assert(planRdds.map(persistedDeps).sum > 0,
      "the PrefixScan checkpoint must be live before release")
    packed.releaseCheckpoints()
    assert(planRdds.map(persistedDeps).sum == 0,
      "releaseCheckpoints must free the buried checkpoint blocks")
    // fractional token columns refuse loudly (one face would truncate)
    intercept[IllegalArgumentException] {
      Chain(spark, "fr15", Seq((1L, 0.6)).toDF("id", "w"))
        .packSequences("w", 10L, Seq("id"))
    }
    // PrefixScan's own output-name guard covers the pack internals
    intercept[IllegalArgumentException] {
      Chain(spark, "oc15", Seq((1L, 1L, 2L)).toDF("id", "n", "_ps_cum"))
        .packSequences("n", 10L, Seq("id"))
    }
  }

  test("pack ops guard the emitted pack_id name; interleave guards its internals") {
    val docs = Seq((1L, "a", 1L, "t")).toDF("id", "pack_id", "n", "text")
    intercept[IllegalArgumentException] {
      Chain(spark, "g1", docs).packSequences("n", 10L, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "g2", docs).packSequencesByTokens("text", 10L, Seq("id"))
    }
    val il = Seq((1L, "a", 1L)).toDF("id", "g", "_il_pos")
    intercept[IllegalArgumentException] {
      Chain(spark, "g3", il).interleaveByWeight("g", Seq("a" -> 1L), Seq("id"))
    }
  }

  test("ScaleLint proves a window key's live domain through a literal-CASE filter") {
    // the retired (pre-round-15) interleaveByWeight shape: weights as a
    // literal CASE, unlisted groups dropped via IS NOT NULL, then a
    // row_number window partitioned by the DATA-typed group key — the
    // live domain is the weight list, and each window partition is an
    // entire source
    // parquet-backed (a LocalRelation fixture would be constant-folded,
    // filter and all); lint BEFORE any action — the lint reads the
    // pre-stage inputPlan, which query-stage wrapping hides after execute
    val docs = table("documents").df
    val retired = docs
      .withColumn("_w", when(col("lang").cast("string") === "en", lit(3L))
        .when(col("lang").cast("string") === "zh", lit(1L))
        .otherwise(lit(null).cast("long")))
      .where(col("_w").isNotNull)
      .withColumn("_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang").cast("string")).orderBy(col("doc_id"))))
    val fs = graft.core.ScaleLint.lint(retired)
    assert(fs.exists(f => f.rule == "low-domain-window-key" &&
      f.detail.contains("domain <= 2")),
      s"lint must fire on the literal-CASE-filtered window key: $fs")
    // the shipped op (PrefixScan regime) stays quiet — no window at all
    val live = table("documents")
      .interleaveByWeight("lang", Seq("en" -> 3L, "zh" -> 1L), Seq("doc_id")).df
    assert(!graft.core.ScaleLint.lint(live).exists(_.rule == "low-domain-window-key"))
    // a filter on a DATA comparison proves nothing — no false positive
    val dataFiltered = docs
      .where(col("lang") =!= col("source"))
      .withColumn("_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("doc_id"))))
    assert(!graft.core.ScaleLint.lint(dataFiltered)
      .exists(_.rule == "low-domain-window-key"))
  }

  // ---- residual IVFADC (byResidual = true) -----------------------------

  private def resLattice = Chain(spark, "pq15r", SparkEntry.embFixtureDf(spark))
  private def resModel = resLattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
    trainSample = 24, iters = 10)

  test("ivfPqIndex byResidual: three row kinds, embedded m*ks codebook, block-dim sub-centroids") {
    val idx = resLattice.ivfPqIndex(resModel.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24, byResidual = true).df.collect()
    val corpus = idx.filter(!_.isNullAt(1))
    val cents = idx.filter(r => r.isNullAt(1) && r.getLong(0) >= 0)
    val cb = idx.filter(r => r.isNullAt(1) && r.getLong(0) == -1L)
    assert(corpus.length == 24 && cents.length == 4 && cb.length == 2 * 4)
    corpus.foreach(r => assert(!r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
      "corpus rows carry codes only"))
    cb.foreach { r =>
      val bc = r.getSeq[Int](2)
      assert(bc.length == 2 && bc.head >= 0 && bc.head < 2 && bc(1) >= 0 && bc(1) < 4,
        s"codebook rows key by [block, code]: $r")
      assert(r.getSeq[Double](3).length == 8,
        "sub-centroids span the block dim (16 / m=2)")
      assert(r.isNullAt(4), "codebook rows carry no norm")
    }
    assert(cb.map(_.getSeq[Int](2)).distinct.length == 8,
      "codebook covers blocks x codes exactly once")
  }

  test("residual search recovers the planted clusters; multi-assign keeps min distance; assign matches build") {
    val model = resModel
    val idx = resLattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24, byResidual = true)
    val queries = Chain(spark, "q15r", SparkEntry.embFixtureDf(spark).where("vec_id < 4"))
    // measured on the lattice (house convention): each query's top-5 are
    // its five planted same-cluster siblings in id order, at np2 and at
    // full probe (residual-metric distances 0.872..0.985)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for (q <- 0L until 4L; k <- 1 to 5) yield (q, q + 4 * k, k)).toSet
    val np2 = queries.searchIvfPq(model.df, idx.df, "vec_id", "embedding",
      k = 5, nprobe = 2).df
    assert(key(np2) == want)
    assert(key(queries.searchIvfPq(model.df, idx.df, "vec_id", "embedding",
      k = 5, nprobe = 4).df) == want)
    // multi-assign residual: same neighbor via two cells keeps the MIN
    // residual-metric distance — the pinned sibling rows survive intact
    val idxA2 = resLattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24, assign = 2, byResidual = true)
    val a2 = queries.searchIvfPq(model.df, idxA2.df, "vec_id", "embedding",
      k = 5, nprobe = 2, indexAssign = 2).df
    assert(key(a2) == want)
    assert(a2.groupBy("query_id", "neighbor_id").count()
      .where(col("count") > 1).count() == 0, "duplicates must collapse")
    // incremental assign self-detects the embedded codebook: re-assigning
    // the same vectors reproduces the build's (cid, code) postings exactly
    val built = idx.df.where(col("_id").isNotNull)
      .select("_id", "_cid", "_pc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet
    val reassigned = resLattice.ivfPqIndexAssign(idx.df, model.df,
      "vec_id", "embedding")
      .df.select("_id", "_cid", "_pc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2))).toSet
    assert(reassigned == built,
      "assign must encode in the same residual metric as the build")
  }

  test("searchIvfPqRerank: shortlist regime refines ADC candidates to the exact cosine order") {
    val model = resModel
    val corpus = SparkEntry.embFixtureDf(spark)
    val queries = Chain(spark, "rr15", corpus.where("vec_id < 4"))
    val exact = resLattice.cosineTopK(corpus.where("vec_id < 4"),
      "vec_id", "embedding", 5).df
    // raw index, np2 shortlist of 10: the 5 planted siblings are inside
    // the shortlist, and the refine stage re-orders them by EXACT cosine
    // — output identical (values included) to the exact op
    val idx = resLattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val got = queries.searchIvfPqRerank(model.df, idx.df, corpus,
      "vec_id", "embedding", k = 5, rerankPerQuery = 10, nprobe = 2).df
    assert(rows(got) == rows(exact),
      "refined shortlist must equal the exact top-5 on the lattice")
    // residual index face: stage 1 self-detects the codebook, the refine
    // output is the same exact order
    val idxR = resLattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24, byResidual = true)
    val gotR = queries.searchIvfPqRerank(model.df, idxR.df, corpus,
      "vec_id", "embedding", k = 5, rerankPerQuery = 10, nprobe = 2).df
    assert(rows(gotR) == rows(exact))
    intercept[IllegalArgumentException] {
      queries.searchIvfPqRerank(model.df, idx.df, corpus,
        "vec_id", "embedding", k = 5, rerankPerQuery = 3)
    }
  }

  test("residual dedup screen runs in the residual metric with a measured margin") {
    val model = resModel
    val idx = resLattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24, byResidual = true)
    // lattice-measured (house convention): the smallest ADC distance of
    // any corpus vector to any probed code — its OWN included — sits in
    // (0.80, 0.85]; 0.5 keeps everything with >0.3 margin, and the
    // plateau at 0.85-0.87 drops exactly one cluster's five rows
    assert(resLattice.dedupAgainstIvfPqIndex(idx.df, model.df,
      "vec_id", "embedding", maxDist = 0.5, nprobe = 2).df.count() == 24)
    assert(resLattice.dedupAgainstIvfPqIndex(idx.df, model.df,
      "vec_id", "embedding", maxDist = 0.86, nprobe = 2).df.count() == 19)
  }

  test("embeddingDrift: identical snapshots report zero gap and ppm-unit ratio; renders") {
    val vecs = Seq(
      (1L, "a", Seq(1.0, 2.0)), (2L, "a", Seq(3.0, 4.0)),
      (3L, "b", Seq(0.5, 0.5)), (4L, "b", Seq(1.5, -0.5)),
      (5L, null.asInstanceOf[String], Seq(2.0, 2.0))).toDF("id", "g", "v")
    val mom = Chain(spark, "r15d_vecs", vecs).embeddingMoments(Seq("g"), "v")
    val drift = mom.embeddingDrift(mom, Seq("g"))
    val got = drift.df.collect()
    // every (group incl. the NULL one, dim) pair reports: 3 groups x 2 dims
    assert(got.length == 6, s"expected 6 drift rows, got ${got.toSeq}")
    assert(got.forall(_.getAs[Long]("mean_gap_fp") == 0L))
    // var ratio vs itself = 1.0 -> 1e6 ppm; constant dims (zero variance)
    // report NULL, never divide
    got.foreach { r =>
      val vr = Option(r.getAs[java.lang.Long]("var_ratio_fp"))
      assert(vr.forall(_ == 1000000L), s"self-ratio must be 1e6 ppm or NULL: $r")
    }
    assert(got.exists(r => r.isNullAt(r.fieldIndex("var_ratio_fp"))),
      "the single-vector NULL group has zero variance -> NULL ratio")
    // genuinely shifted halves: gap = (mean_l - mean_r) in 1e-9 units
    val momB = Chain(spark, "r15d_vecs2",
      vecs.withColumn("v", transform(col("v"), x => x + lit(0.25))))
      .embeddingMoments(Seq("g"), "v")
    val shifted = mom.embeddingDrift(momB, Seq("g")).df.collect()
    assert(shifted.forall(_.getAs[Long]("mean_gap_fp") == -250000000L),
      s"a uniform +0.25 right shift must read -0.25: ${shifted.toSeq}")
    // VIEWS render cascade executes and matches the DataFrame face
    vecs.createOrReplaceTempView("r15d_vecs")
    drift.sql("VIEWS", "r15d_out").split(";\n").foreach(spark.sql)
    assert(rows(spark.table("r15d_out")) == rows(drift.df))
    // guards: non-moments input, colliding group names
    intercept[IllegalArgumentException] {
      Chain(spark, "r15d_raw", vecs).embeddingDrift(mom, Seq("g"))
    }
    intercept[IllegalArgumentException] {
      mom.embeddingDrift(mom, Seq("pos"))
    }
  }

  test("ScaleLint reads the post-EnsureRequirements plan: exchanges are visible") {
    // pre-round-15 the lint walked inputPlan (no Exchange nodes ever) and
    // exchange-count read 0 for every plan; initialPlan carries them
    val docs = table("documents").df
    val shuffled = docs.groupBy("lang").count()
    val fs = graft.core.ScaleLint.lint(shuffled)
    val count = fs.find(_.rule == "exchange-count").map(_.detail).getOrElse("")
    assert(!count.startsWith("0 "), s"a groupBy plan must show its exchange: $fs")
  }

  test("asof_join rejects frames already carrying its union-window internals") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "_rvb")
    val r = Seq((1L, 9L, 2.5)).toDF("k", "rt", "px")
    intercept[IllegalArgumentException] {
      Chain(spark, "al", l).asofJoin(Chain(spark, "ar", r), Seq("k"), "t", "rt",
        direction = "nearest")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "al2", Seq((1L, 10L, "x")).toDF("k", "t", "_src"))
        .asofJoin(Chain(spark, "ar2", r), Seq("k"), "t", "rt")
    }
  }
}
