package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-14 batch: IVFADC (ivfPqIndex / searchIvfPq),
  * token-budget packing, and the host-level link-rank rollup.
  */
class Round14Spec extends AnyFunSuite {
  import spark.implicits._

  private def lattice = Chain(spark, "pq_fix", SparkEntry.embFixtureDf(spark))

  private def latticeModel =
    lattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10)

  test("ivfPqIndex: two row kinds, codes on corpus rows, cluster-aligned cells") {
    val idx = lattice.ivfPqIndex(latticeModel.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24).df.collect()
    val corpus = idx.filter(!_.isNullAt(1))
    val cents = idx.filter(_.isNullAt(1))
    assert(corpus.length == 24 && cents.length == 4)
    corpus.foreach { r =>
      assert(!r.isNullAt(2), "corpus rows carry PQ codes")
      assert(r.isNullAt(3) && r.isNullAt(4), "corpus rows drop the raw vector")
    }
    cents.foreach { r =>
      assert(r.isNullAt(2), "centroid rows carry no code")
      assert(!r.isNullAt(3) && r.getDouble(4) == 1.0,
        "centroid rows keep the probe geometry (unit-norm centers)")
    }
    // the 4 planted lattice clusters land in 4 distinct cells, whole
    val cellOf = corpus.map(r => r.getLong(1) -> r.getLong(0)).toMap
    val byCluster = (0 until 4).map(cl =>
      (0 until 24).filter(_ % 4 == cl).map(i => cellOf(i.toLong)).distinct)
    assert(byCluster.forall(_.size == 1), s"split clusters: $byCluster")
    assert(byCluster.flatten.distinct.size == 4, "clusters share no cell")
  }

  test("searchIvfPq: nprobe=nlist equals full-scan ADC exactly; nprobe=2 recalls the planted cluster") {
    val model = latticeModel
    val idx = lattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val queries = Chain(spark, "q14", SparkEntry.embFixtureDf(spark).where("vec_id < 4"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // all cells probed -> identical rows AND identical ADC distances to
    // the full-scan face (same kernel, same codes, same tie-break)
    val full = key(Chain(spark, "pq_corpus14",
      lattice.pqEncode(model.df, "embedding").df.select("vec_id", "pq_code"))
      .searchPq(model.df, queries.df, "vec_id", "embedding", k = 5).df)
    val all = key(queries.searchIvfPq(model.df, idx.df, "vec_id", "embedding",
      k = 5, nprobe = 4).df)
    assert(all == full, "IVFADC at full probe budget must replay full-scan ADC")
    // pruned probe: the oracle rows — each query's five planted siblings
    val pruned = queries.searchIvfPq(model.df, idx.df, "vec_id", "embedding",
      k = 5, nprobe = 2).df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    (0 until 4).foreach { q =>
      (1 to 5).foreach { rk =>
        assert(pruned((q.toLong, rk)) == q + 4L * rk, s"query $q rank $rk")
      }
    }
  }

  test("ivfPqIndex multi-assign: replicated postings, dedup'd probe replays full-scan ADC") {
    val model = latticeModel
    val idx2 = lattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24, assign = 2)
    val posts = idx2.df.where("_id IS NOT NULL").collect()
    assert(posts.length == 48, s"24 rows x 2 cells, got ${posts.length}")
    assert(posts.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 48,
      "each (cell, id) posting appears once")
    val queries = Chain(spark, "q14a2", SparkEntry.embFixtureDf(spark).where("vec_id < 4"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val full = key(Chain(spark, "pq_corpus14b",
      lattice.pqEncode(model.df, "embedding").df.select("vec_id", "pq_code"))
      .searchPq(model.df, queries.df, "vec_id", "embedding", k = 5).df)
    val probed = key(queries.searchIvfPq(model.df, idx2.df, "vec_id", "embedding",
      k = 5, nprobe = 4, indexAssign = 2).df)
    assert(probed == full,
      "full probe of the multi-assign index must collapse duplicates and replay full-scan ADC")
    intercept[IllegalArgumentException] {
      lattice.ivfPqIndex(model.df, "vec_id", "embedding", nlist = 4,
        trainSample = 24, assign = 0)
    }
    intercept[IllegalArgumentException] {
      lattice.ivfPqIndex(model.df, "vec_id", "embedding", nlist = 4,
        trainSample = 24, assign = 5)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "q14a3", queries.df)
        .ivfPqIndexAssign(idx2.df, model.df, "vec_id", "embedding", assign = 9)
    }
  }

  test("IVFADC string-id face: build, probe, and screen with string keys end-to-end") {
    val model = latticeModel
    val strFix = SparkEntry.embFixtureDf(spark)
      .withColumn("vec_id", format_string("v-%03d", col("vec_id")))
    val idx = Chain(spark, "spq", strFix)
      .ivfPqIndex(model.df, "vec_id", "embedding", nlist = 4, trainSample = 24)
    assert(idx.df.where("_id IS NOT NULL").count() == 24)
    assert(idx.df.schema("_id").dataType ==
      org.apache.spark.sql.types.StringType, "string ids pass through natively")
    val res = Chain(spark, "spqq", strFix.where("vec_id < 'v-004'"))
      .searchIvfPq(model.df, idx.df, "vec_id", "embedding", k = 5, nprobe = 2)
      .df.collect().map(r => (r.getString(0), r.getInt(3)) -> r.getString(1)).toMap
    (0 until 4).foreach { q =>
      (1 to 5).foreach { rk =>
        assert(res((f"v-$q%03d", rk)) == f"v-${q + 4 * rk}%03d",
          s"query $q rank $rk")
      }
    }
    // the ADC screen drops/keeps the same rows as the long-id fixture
    val hist = Chain(spark, "spqh", strFix.where("vec_id < 'v-012'"))
      .ivfPqIndex(model.df, "vec_id", "embedding", nlist = 4, trainSample = 24)
    val surv = Chain(spark, "spqb", strFix.where("vec_id >= 'v-012'"))
      .dedupAgainstIvfPqIndex(hist.df, model.df, "vec_id", "embedding",
        maxDist = 1.0, nprobe = 4)
      .df.select("vec_id").collect().map(_.getString(0)).sorted.toSeq
    assert(surv == Seq("v-012", "v-013", "v-014", "v-015", "v-023"), s"got $surv")
  }

  test("searchIvfPq guards: schema, id family, parameter bounds") {
    val model = latticeModel
    val idx = lattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val queries = Chain(spark, "q14g", SparkEntry.embFixtureDf(spark).where("vec_id < 2"))
    intercept[IllegalArgumentException] {
      queries.searchIvfPq(model.df, idx.df, "vec_id", "embedding", k = 0)
    }
    intercept[IllegalArgumentException] {
      queries.searchIvfPq(model.df, idx.df, "vec_id", "embedding", nprobe = 0)
    }
    intercept[IllegalArgumentException] {
      queries.searchIvfPq(model.df, idx.df.drop("_pc"), "vec_id", "embedding")
    }
    // string query ids against a long-id index must refuse, not null-join
    val strQ = Chain(spark, "q14s", queries.df
      .withColumn("vec_id", format_string("v-%d", col("vec_id"))))
    intercept[IllegalArgumentException] {
      strQ.searchIvfPq(model.df, idx.df, "vec_id", "embedding")
    }
  }

  test("packSequencesByTokens: bins by the exclusive running bpeish total per group") {
    val docs = Seq(
      ("en", 1L, "one two three"),            // 3 bpeish tokens
      ("en", 2L, "four five six seven!"),     // 5 (the mark counts)
      ("en", 3L, "a b c d"),                  // 4
      ("de", 4L, "ein zwei")).toDF("lang", "doc_id", "text")
    val got = Chain(spark, "pt", docs)
      .packSequencesByTokens("text", 6L, orderBy = Seq("doc_id"),
        partitionBy = Seq("lang")).df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_tokens"), r.getAs[Long]("pack_id"))).toMap
    // en cumulative-before: 0, 3, 8 -> packs 0, 0, 1; de: 0 -> 0
    assert(got == Map(1L -> (3L, 0L), 2L -> (5L, 0L), 3L -> (4L, 1L), 4L -> (2L, 0L)))
    // SQL face agrees with the DataFrame face
    docs.createOrReplaceTempView("pack_tok_docs")
    val c = Chain(spark, "pack_tok_docs", docs)
      .packSequencesByTokens("text", 6L, orderBy = Seq("doc_id"),
        partitionBy = Seq("lang"))
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "pt", docs).packSequencesByTokens("text", 0L, Seq("doc_id"))
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "pt", docs.withColumn("pack_tokens", lit(1L)))
        .packSequencesByTokens("text", 6L, Seq("doc_id"))
    }
  }

  test("uniMaxAllocation: water-filling replays by hand, remainder to the smallest strata") {
    val docs = (Seq.fill(1)("a" -> 10L) ++ Seq.fill(2)("b" -> 10L) ++
      Seq.fill(5)("c" -> 10L)).zipWithIndex
      .map { case ((g, t), i) => (i.toLong, g, t) }.toDF("id", "g", "tok")
    // tokens a=10 b=20 c=50, caps (E=2) 20/40/100
    def alloc(b: Long) = Chain(spark, "um", docs)
      .uniMaxAllocation("g", "tok", b, maxEpochs = 2).df.collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // B=70: a caps at 20; b,c split 50 evenly
    assert(alloc(70L) == Map(
      "a" -> (20L, 2000000L, 1000000L),
      "b" -> (25L, 1250000L, 1000000L),
      "c" -> (25L, 500000L, 500000L)))
    // B=71: remainder 1 goes to the smaller remaining stratum (b)
    assert(alloc(71L) == Map(
      "a" -> (20L, 2000000L, 1000000L),
      "b" -> (26L, 1300000L, 1000000L),
      "c" -> (25L, 500000L, 500000L)))
    // budget above every cap: all strata fully capped
    assert(alloc(1000L).values.map(_._1).toSeq.sorted == Seq(20L, 40L, 100L))
    // SQL face agrees
    docs.createOrReplaceTempView("um_docs")
    val c = Chain(spark, "um_docs", docs)
      .uniMaxAllocation("g", "tok", 71L, maxEpochs = 2)
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "um", docs).uniMaxAllocation("g", "tok", 0L)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "um", docs).uniMaxAllocation("g", "tok", 70L, maxEpochs = 0)
    }
  }

  test("mixUniMax: whole strata keep everything, sampled strata carry their epochs") {
    val docs = (0 until 40).map(i =>
      (i.toLong, if (i < 4) "small" else "big", 10L)).toDF("id", "g", "tok")
    // tokens small=40 big=360, caps (E=2) 80/720; B=200 -> small caps at
    // 80 (2 epochs), big gets 120 of 360 -> keep_fp 333333
    val got = Chain(spark, "mx", docs)
      .mixUniMax("g", "tok", 200L, 2, keyCols = Seq("id")).df.collect()
    val byG = got.groupBy(_.getString(1))
    assert(byG("small").length == 4, "fully-allocated stratum keeps every row")
    assert(byG("small").forall(_.getAs[Long]("mix_epochs_fp") == 2000000L))
    val big = byG.getOrElse("big", Array.empty)
    assert(big.nonEmpty && big.length < 36, s"big must downsample, kept ${big.length}")
    assert(big.forall(_.getAs[Long]("mix_epochs_fp") == 333333L))
    // deterministic: the same rows survive a re-run
    val again = Chain(spark, "mx", docs)
      .mixUniMax("g", "tok", 200L, 2, keyCols = Seq("id")).df.collect()
    assert(got.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // SQL face agrees (references {{source}} twice: rows + census)
    docs.createOrReplaceTempView("mx_docs")
    val c = Chain(spark, "mx_docs", docs).mixUniMax("g", "tok", 200L, 2, Seq("id"))
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "mx", docs).mixUniMax("g", "tok", 200L, 2, Nil)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "mx", docs.withColumn("mix_epochs_fp", lit(1L)))
        .mixUniMax("g", "tok", 200L, 2, Seq("id"))
    }
  }

  test("asofJoin nearest: closer side wins, ties go backward, SQL face agrees") {
    val left = Seq((1L, "k", 10L), (2L, "k", 20L), (3L, "k", 21L),
      (4L, "k", 35L), (5L, "nomatch", 7L)).toDF("id", "g", "t")
    val right = Seq(("k", 12L, "a"), ("k", 30L, "b")).toDF("g", "rt", "v")
    val got = Chain(spark, "al", left)
      .asofJoin(Chain(spark, "ar", right), Seq("g"), "t", "rt",
        direction = "nearest").df.collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)).orNull).toMap
    // 10→12 (only forward), 20→12 (8 < 10), 21: 9 == 9 tie → backward 12,
    // 35→30, key with no right rows → null
    assert(got == Map(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> null))
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")
    val c = Chain(spark, "asof_l", left)
      .asofJoin(Chain(spark, "asof_r", right), Seq("g"), "t", "rt",
        direction = "nearest")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "al", left).asofJoin(Chain(spark, "ar", right),
        Seq("g"), "t", "rt", direction = "sideways")
    }
  }

  test("asofJoin tolerance: matches beyond the window null out, every direction") {
    val left = Seq((1L, "k", 10L), (2L, "k", 100L)).toDF("id", "g", "t")
    val right = Seq(("k", 8L, "a"), ("k", 104L, "b")).toDF("g", "rt", "v")
    def run(dir: String, tol: String) = Chain(spark, "tl", left)
      .asofJoin(Chain(spark, "tr", right), Seq("g"), "t", "rt",
        direction = dir, tolerance = Some(tol)).df.collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)).orNull).toMap
    // backward: 10 matches 8 (dist 2 <= 5); 100 matches 8 at dist 92 -> null
    assert(run("backward", "5") == Map(1L -> "a", 2L -> null))
    // forward: 10 -> 104 at dist 94 -> null; 100 -> 104 (dist 4 <= 5)
    assert(run("forward", "5") == Map(1L -> null, 2L -> "b"))
    // nearest: 10 -> 8 (2), 100 -> 104 (4); tol 3 keeps only the first
    assert(run("nearest", "3") == Map(1L -> "a", 2L -> null))
    // SQL face agrees on the tolerance path
    left.createOrReplaceTempView("tol_l")
    right.createOrReplaceTempView("tol_r")
    val c = Chain(spark, "tol_l", left)
      .asofJoin(Chain(spark, "tol_r", right), Seq("g"), "t", "rt",
        direction = "backward", tolerance = Some("5"))
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "tl", left).asofJoin(Chain(spark, "tr", right),
        Seq("g"), "t", "rt", tolerance = Some("  "))
    }
  }

  test("corpusOverlap: hand-counted fingerprint census, SQL face agrees") {
    val a = Seq((1L, "The cat  sat"), (2L, "dog runs"), (3L, "bird flies"),
      (4L, "THE CAT SAT")).toDF("id", "text") // 4 normalizes into 1
    val b = Seq((9L, "the cat sat"), (10L, "fish swims")).toDF("id", "text")
    val got = Chain(spark, "ca", a)
      .corpusOverlap(Chain(spark, "cb", b), "text").df.collect()(0)
    // left distinct fps: {cat-sat, dog-runs, bird-flies} = 3; right = 2;
    // common = 1; jaccard = 1e6 DIV 4
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((3L, 2L, 1L, 250000L)), s"got $got")
    a.createOrReplaceTempView("co_a")
    b.createOrReplaceTempView("co_b")
    val c = Chain(spark, "co_a", a).corpusOverlap(Chain(spark, "co_b", b), "text")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    // disjoint corpora: zero common, zero jaccard; guard on missing column
    val d = Chain(spark, "ca", a)
      .corpusOverlap(Chain(spark, "cd", b.withColumn("text", lit("zzz"))), "text")
      .df.collect()(0)
    assert(d.getLong(2) == 0L && d.getLong(3) == 0L)
    intercept[IllegalArgumentException] {
      Chain(spark, "ca", a).corpusOverlap(Chain(spark, "cb", b), "nope")
    }
  }

  test("embeddingMoments: hand-computed per-dim stats; NaN vectors excluded whole") {
    val vs = Seq(
      (1L, "a", Array(1.0f, 2.0f)),
      (2L, "a", Array(3.0f, 2.0f)),
      (3L, "a", Array(Float.NaN, 9.0f)), // one poisoned element drops the row
      (4L, "b", Array(5.0f, 6.0f))).toDF("id", "g", "embedding")
    val got = Chain(spark, "em", vs).embeddingMoments(Seq("g"), "embedding")
      .df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3))).toMap
    // a: dims (1,3) and (2,2) -> means (2, 2), vars (1, 0); b: single
    // vector -> vars clamp to exactly 0
    assert(got("a")._1 == 2L && got("b")._1 == 1L)
    assert(got("a")._2 == Seq(2.0, 2.0) && got("a")._3 == Seq(1.0, 0.0),
      s"a moments: ${got("a")}")
    assert(got("b")._2 == Seq(5.0, 6.0) && got("b")._3 == Seq(0.0, 0.0))
    // SQL face agrees
    vs.createOrReplaceTempView("em_vs")
    val c = Chain(spark, "em_vs", vs).embeddingMoments(Seq("g"), "embedding")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "em", vs).embeddingMoments(Nil, "embedding")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "em", vs.withColumnRenamed("g", "mean"))
        .embeddingMoments(Seq("mean"), "embedding")
    }
  }

  test("corpusOverlapByGroup: per-group containment against the whole reference") {
    val a = Seq((1L, "en", "the cat sat"), (2L, "en", "dog runs"),
      (3L, "de", "der hund"), (4L, "de", "die katze"), (5L, "de", "der hund"))
      .toDF("id", "lang", "text") // de row 5 duplicates 3 -> 2 distinct
    val ref = Seq((9L, "THE CAT  SAT"), (10L, "der hund")).toDF("id", "text")
    val got = Chain(spark, "ga", a)
      .corpusOverlapByGroup(Chain(spark, "gr", ref), Seq("lang"), "text")
      .df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // en: 2 fps, 1 contained -> 500000 ppm; de: 2 fps, 1 contained
    assert(got == Map("en" -> (2L, 1L, 500000L), "de" -> (2L, 1L, 500000L)),
      s"got $got")
    a.createOrReplaceTempView("gov_a")
    ref.createOrReplaceTempView("gov_r")
    val c = Chain(spark, "gov_a", a)
      .corpusOverlapByGroup(Chain(spark, "gov_r", ref), Seq("lang"), "text")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "ga", a).corpusOverlapByGroup(Chain(spark, "gr", ref), Nil, "text")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "ga", a.withColumnRenamed("lang", "n_left"))
        .corpusOverlapByGroup(Chain(spark, "gr", ref), Seq("n_left"), "text")
    }
  }

  test("rankEval: ap_fp replays the hand-computed TREC average precision") {
    val run = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 20L, 3), (1L, 98L, 4),
      (2L, 97L, 1), (2L, 96L, 2)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 50L))
      .toDF("query_id", "doc_id")
    val got = Chain(spark, "rr", run)
      .rankEval(Chain(spark, "rq", qrels), "query_id", "doc_id", "rank", k = 10)
      .df.collect().map(r => r.getLong(0) -> r.getAs[Long]("ap_fp")).toMap
    // q1: hits at ranks 1 (i=1, P=1e6) and 3 (i=2, P=fpq(2/3)=666667);
    // ap = (1000000 + 666667) DIV 3; q2: no hits → 0
    assert(got == Map(1L -> (1666667L / 3), 2L -> 0L))
  }

  test("dedupAgainstIvfPqIndex: ADC threshold screens the batch; assign extends postings") {
    val model = latticeModel
    val hist = Chain(spark, "pqh", SparkEntry.embFixtureDf(spark).where("vec_id < 12"))
    val idx = hist.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val batch = Chain(spark, "pqb", SparkEntry.embFixtureDf(spark).where("vec_id >= 12"))
    val survivors = batch.dedupAgainstIvfPqIndex(idx.df, model.df,
      "vec_id", "embedding", maxDist = 1.0, nprobe = 4)
      .df.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors == Seq(12L, 13L, 14L, 15L, 23L), s"got $survivors")
    // a zero maxDist drops nothing (no exact code-space coincidence of
    // RAW batch vectors at distance 0 on this jittered fixture)
    assert(batch.dedupAgainstIvfPqIndex(idx.df, model.df,
      "vec_id", "embedding", maxDist = 0.0).df.count() == 12)
    // assign: batch rows land in their clusters' cells with codes
    val appended = Chain(spark, "pqa", batch.df)
      .ivfPqIndexAssign(idx.df, model.df, "vec_id", "embedding").df.collect()
    assert(appended.length == 12)
    val cellOf = idx.df.where(col("_id").isNotNull).collect()
      .map(r => r.getLong(1) % 4 -> r.getLong(0)).distinct.toMap
    appended.foreach { r =>
      assert(r.getLong(0) == cellOf(r.getLong(1) % 4),
        s"row ${r.getLong(1)} must join its planted cluster's cell")
      assert(!r.isNullAt(2) && r.isNullAt(3), "codes stored, vectors not")
    }
    intercept[IllegalArgumentException] {
      batch.dedupAgainstIvfPqIndex(idx.df.drop("_pc"), model.df,
        "vec_id", "embedding", 1.0)
    }
    intercept[IllegalArgumentException] {
      batch.dedupAgainstIvfPqIndex(idx.df, model.df, "vec_id", "embedding",
        maxDist = Double.NaN)
    }
  }

  test("interleaveByWeight: stride order mixes sources proportionally from the start") {
    val docs = ((1 to 6).map(i => (i.toLong, "a")) ++
      (7 to 8).map(i => (i.toLong, "b")) ++ Seq((9L, "drop"))).toDF("id", "g")
    val c = Chain(spark, "il", docs)
      .interleaveByWeight("g", Seq("a" -> 3L, "b" -> 1L), orderBy = Seq("id"))
    val got = c.df.collect().map(r => (r.getLong(0), r.getAs[Long]("interleave_key")))
    // keys: a_i = i*1e6/3 -> 333333,666666,1000000,1333333,...; b_i = i*1e6
    // ordered stream: a1 a2 a3/b1(tie: a first) ... three a's per b
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 7L, 4L, 5L, 6L, 8L),
      s"got ${got.map(_._1).toSeq}")
    assert(!got.map(_._1).contains(9L), "unweighted groups drop")
    assert(got.toMap.apply(7L) == 1000000L && got.toMap.apply(3L) == 1000000L)
    // SQL face agrees (row set + key values)
    docs.createOrReplaceTempView("il_docs")
    val c2 = Chain(spark, "il_docs", docs)
      .interleaveByWeight("g", Seq("a" -> 3L, "b" -> 1L), orderBy = Seq("id"))
    assert(rows(spark.sql(c2.sql())) == rows(c2.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "il", docs).interleaveByWeight("g", Nil, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "il", docs).interleaveByWeight("g", Seq("a" -> 0L), Seq("id"))
    }
  }

  test("round-14 plan shapes: two-scan UniMax mix, twice-read file-backed IVFADC index") {
    // mixUniMax: exactly ONE corpus file scan in the FINAL plan — the
    // row-filter pass. The stratum-census scan still happens (total
    // corpus passes remain the two declared ones) but moved to the eager
    // PrefixScan materialization at op construction (round 16); the
    // final plan's census branch reads those checkpoint blocks. No
    // cartesian anywhere (the census joins back broadcast on stratum)
    val mix = table("documents").mixUniMax("lang", "n_chars", 50000L, 2, Seq("doc_id"))
    mix.df.count()
    val mixScans = countScans(mix.df.queryExecution.executedPlan)
    assert(mixScans == 1, s"mixUniMax must scan the corpus exactly once, got $mixScans")
    assert(!mix.df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // searchIvfPq over a SAVED index: the index file is read exactly
    // twice (nlist centroid markers + the posting scan), the postings
    // meet the tiny probe set in a broadcast hash join on _cid — the
    // corpus-side frame never shuffles before its join
    val model = latticeModel
    val dir = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    lattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24).df.write.mode("overwrite").parquet(dir)
    val res = Chain(spark, "q14p", SparkEntry.embFixtureDf(spark).where("vec_id < 4"))
      .searchIvfPq(model.df, spark.read.parquet(dir), "vec_id", "embedding",
        k = 5, nprobe = 2)
    res.df.count()
    val plan = res.df.queryExecution.executedPlan
    val idxScans = countScans(plan)
    assert(idxScans == 2, s"saved index must be read exactly twice, got $idxScans")
    val planStr = plan.toString
    assert(planStr.contains("BroadcastHashJoin"),
      s"posting join must broadcast the probe set:\n$planStr")
    assert(!planStr.contains("CartesianProduct"),
      s"no true cartesian in the IVFADC probe:\n$planStr")
  }

  test("VIEWS render cascade executes for the round-14 multi-source and census faces") {
    val docs = Seq(("en", 1L, "one two"), ("en", 2L, "three four five"),
      ("de", 3L, "sechs")).toDF("lang", "doc_id", "text")
    docs.createOrReplaceTempView("r14v_docs")
    // mixUniMax references {{source}} twice (rows + census): the VIEWS
    // cascade substitutes the SAME step alias for both — pin it executes
    val mix = Chain(spark, "r14v_docs", docs)
      .mixUniMax("lang", "doc_id", 100L, 2, Seq("doc_id"))
    mix.sql("VIEWS", "r14v_mix_out").split(";\n").foreach(spark.sql)
    assert(rows(spark.table("r14v_mix_out")) == rows(mix.df))
    val alloc = Chain(spark, "r14v_docs", docs)
      .uniMaxAllocation("lang", "doc_id", 100L, 2)
    alloc.sql("VIEWS", "r14v_alloc_out").split(";\n").foreach(spark.sql)
    assert(rows(spark.table("r14v_alloc_out")) == rows(alloc.df))
  }

  test("round-14 parameter paths: ungrouped packing, oversize k, equal-weight round-robin") {
    // ungrouped token packing: one global fold
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g")).toDF("id", "text")
    val packs = Chain(spark, "pp", docs)
      .packSequencesByTokens("text", 4L, Seq("id"))
      .df.collect().map(r => r.getLong(0) -> r.getAs[Long]("pack_id")).toMap
    // bpeish counts 3,2,2; exclusive cum 0,3,5 -> packs 0,0,1
    assert(packs == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    // oversize k returns every candidate (all but self at full probe)
    val model = latticeModel
    val idx = lattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val res = Chain(spark, "ok14", SparkEntry.embFixtureDf(spark).where("vec_id = 0"))
      .searchIvfPq(model.df, idx.df, "vec_id", "embedding", k = 1000, nprobe = 4).df
    assert(res.count() == 23)
    // equal weights degrade to strict round-robin
    val rr = ((1 to 2).map(i => (i.toLong, "x")) ++ (3 to 4).map(i => (i.toLong, "y")))
      .toDF("id", "g")
    val order = Chain(spark, "rr14", rr)
      .interleaveByWeight("g", Seq("x" -> 1L, "y" -> 1L), Seq("id"))
      .df.collect().map(_.getLong(0)).toSeq
    assert(order == Seq(1L, 3L, 2L, 4L), s"got $order")
    // multi-key mix sampling: the md5 key concatenates all key columns
    val mixed = Chain(spark, "mk14",
      (0 until 30).map(i => (i.toLong, s"s${i % 3}", "g", 10L))
        .toDF("id", "src", "g", "tok"))
      .mixUniMax("g", "tok", 100L, 2, keyCols = Seq("src", "id"))
    assert(mixed.df.count() > 0 && mixed.df.count() < 30)
  }

  test("round-14 ops complete on empty inputs") {
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("id", "g", "text")
    assert(Chain(spark, "e1", emptyDocs)
      .packSequencesByTokens("text", 10L, Seq("id")).df.count() == 0)
    assert(Chain(spark, "e2", emptyDocs)
      .uniMaxAllocation("g", "id", 100L).df.count() == 0)
    assert(Chain(spark, "e3", emptyDocs)
      .mixUniMax("g", "id", 100L, 2, Seq("id")).df.count() == 0)
    assert(Chain(spark, "e4", emptyDocs)
      .interleaveByWeight("g", Seq("a" -> 1L), Seq("id")).df.count() == 0)
    val emptyRun = Seq.empty[(Long, Long, Int)].toDF("query_id", "doc_id", "rank")
    assert(Chain(spark, "e5", emptyRun)
      .rankEval(Chain(spark, "e6", emptyRun.select(col("query_id"), col("doc_id"))),
        "query_id", "doc_id", "rank", k = 5).df.count() == 0)
    // empty corpus -> centroid-only index; probing it yields no neighbors
    val model = latticeModel
    val emptyEmb = SparkEntry.embFixtureDf(spark).where("vec_id < 0")
    val idx = lattice.ivfPqIndex(model.df, "vec_id", "embedding",
      nlist = 4, trainSample = 24)
    val noQ = Chain(spark, "e7", emptyEmb)
      .searchIvfPq(model.df, idx.df, "vec_id", "embedding", k = 3)
    assert(noQ.df.count() == 0)
  }

  test("linkRankHost: collapsed weights replay the hand-computed recurrence") {
    // page edges: host a links b twice and c once; b links a once; c dangles
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"))
      .toDF("src_host", "dst_host")
    val got = Chain(spark, "he", edges)
      .linkRankHost("src_host", "dst_host", iterations = 1,
        scale = 1000000L).df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=3, scale=1e6: pr0 = 333333 each; tele = 15e6/300 = 50000
    // outw(a)=3, outw(b)=1; c dangling with mass 333333 -> //3 = 111111
    // shares: a->b 2*(333333//3)=222222, a->c 111111, b->a 333333
    val dangPer = 333333L / 3
    def nxt(contrib: Long) = 50000L + (85L * (contrib + dangPer)) / 100
    assert(got == Map("a" -> nxt(333333L), "b" -> nxt(222222L), "c" -> nxt(111111L)))
  }

  test("linkRankWeighted: explicit weights equal the host face's derived counts") {
    val pages = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "a")).toDF("s", "d")
    val host = Chain(spark, "w1", pages).linkRankHost("s", "d", iterations = 2)
    val wedges = Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L))
      .toDF("s", "d", "w")
    val wtd = Chain(spark, "w2", wedges).linkRankWeighted("s", "d", "w", iterations = 2)
    assert(rows(wtd.df) == rows(host.df),
      "explicit weights must replay the host face's collapsed counts")
    // parallel weighted edges SUM; zero/null weights drop the edge (and
    // with it any would-be out-degree)
    val dup = Seq(("a", "b", 1L), ("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 0L)).toDF("s", "d", "w")
    val got = Chain(spark, "w3", dup).linkRankWeighted("s", "d", "w", iterations = 2)
    assert(rows(got.df) == rows(host.df),
      "summed duplicates match; the zero-weight edge adds nothing")
    intercept[IllegalArgumentException] {
      Chain(spark, "w4", wedges).linkRankWeighted("s", "d", "missing")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "w5", wedges.withColumn("w", col("w").cast("double")))
        .linkRankWeighted("s", "d", "w")
    }
  }

  test("linkRankHost on distinct unit edges equals linkRank; guards hold") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val host = Chain(spark, "g1", edges).linkRankHost("s", "d", iterations = 3)
    val page = Chain(spark, "g2", edges).linkRank("s", "d", iterations = 3)
    assert(rows(host.df) == rows(page.df),
      "unit weights must reduce to the page-level recurrence")
    intercept[IllegalArgumentException] {
      Chain(spark, "g3", edges).linkRankHost("s", "missing")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "g4", edges.withColumn("d", format_string("h-%d", col("d"))))
        .linkRankHost("s", "d")
    }
    // empty edge frame: typed empty result, not a failure
    val empty = Chain(spark, "g5", edges.where(lit(false)))
      .linkRankHost("s", "d").df
    assert(empty.columns.toSeq == Seq("node", "rank_fp", "rank") && empty.count() == 0)
  }
}
