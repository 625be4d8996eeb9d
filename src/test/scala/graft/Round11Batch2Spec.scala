package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ext._
import graft.streaming.EventStreams
import TestSpark._

/** Gates for the round-11 heavy-hitters scale family: the frequent-items
  * twin of the exact n-gram census (topNgramsSketch — the exact face's
  * full-domain gram shuffle replaced by one bounded mergeable sketch per
  * group) and the streaming profile sink that makes it continuous
  * (sinkFreqSketchToTable + the freq_union merge scalar). The
  * frequent-items algorithm has no randomness, so EXACT-REGIME
  * assertions (distinct < 0.75×maxMapSize: counts exact, lb = est = ub)
  * are equality against the exact census; the approximate regime is
  * gated on the sketch's published contract (NO_FALSE_NEGATIVES, true
  * count within [lb, ub]) — never on specific estimates.
  */
class Round11Batch2Spec extends AnyFunSuite {
  import spark.implicits._

  test("top_ngrams_sketch equals the exact census in the exact regime, lb = cnt = ub") {
    val docs = table("documents")
    val exact = rows(docs.topNgrams("text", n = 2, k = 25).df)
    val sk = docs.topNgramsSketch("text", n = 2, k = 25, maxMapSize = 2048).df
    assert(rows(sk.select("ngram", "cnt")) == exact,
      "exact-regime sketch top-k must equal the census top-k")
    assert(sk.where(col("cnt_lb") =!= col("cnt") || col("cnt_ub") =!= col("cnt"))
      .isEmpty, "exact regime means zero error: lb = cnt = ub on every row")
  }

  test("top_ngrams_sketch grouped face matches the grouped census per group") {
    val docs = table("documents")
    val exact = rows(docs.topNgrams("text", n = 1, k = 10, groupBy = Seq("lang")).df)
    val sk = docs.topNgramsSketch("text", n = 1, k = 10,
      groupBy = Seq("lang"), maxMapSize = 2048).df
    assert(rows(sk.select("lang", "ngram", "cnt")) == exact)
  }

  test("approximate regime: NO_FALSE_NEGATIVES and true count inside [lb, ub]") {
    // 60 distinct background tokens >> 0.75 x maxMapSize(16): the sketch
    // purges, but the dominant token (120 occurrences vs 2 each) is a
    // guaranteed heavy hitter and its TRUE count must sit in [lb, ub]
    val texts = (1 to 120).map(_ => "hot") ++
      (1 to 60).flatMap(i => Seq(s"bg$i", s"bg$i"))
    val df = new scala.util.Random(7).shuffle(texts).toDF("text")
    val out = Chain(spark, "hh_fix", df)
      .topNgramsSketch("text", n = 1, k = 5, maxMapSize = 16).df.collect()
    val hot = out.find(_.getString(0) == "hot")
    assert(hot.isDefined, "the true heavy hitter must appear (NO_FALSE_NEGATIVES)")
    val (lb, ub) = (hot.get.getLong(2), hot.get.getLong(3))
    assert(lb <= 120L && 120L <= ub, s"true count 120 outside [$lb, $ub]")
  }

  test("top_ngrams_sketch SQL face is Spark-executable, equals the frame in the exact regime") {
    val docs = table("documents")
    val g = docs.topNgramsSketch("text", n = 2, k = 15, maxMapSize = 2048)
    assert(rows(spark.sql(g.sql())) == rows(g.df))
    val grp = docs.topNgramsSketch("text", n = 1, k = 5,
      groupBy = Seq("lang"), maxMapSize = 2048)
    assert(rows(spark.sql(grp.sql())) == rows(grp.df))
  }

  test("top_ngrams_sketch input hygiene: null/blank/short texts drop; empty input -> 0 rows") {
    val df = Seq(Some("alpha beta"), Some("alpha beta"), Some("  "), None,
      Some("solo")).toDF("text")
    val out = Chain(spark, "tns_fix", df)
      .topNgramsSketch("text", n = 2, k = 10, maxMapSize = 64).df.collect()
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("alpha beta" -> 2L), "blank/null/short-token texts contribute nothing")
    val empty = Chain(spark, "tns_e",
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("text STRING")))
      .topNgramsSketch("text", n = 2, k = 10).df
    assert(empty.isEmpty, "empty corpus -> zero rows, like the exact face")
  }

  test("top_ngrams_sketch scale shape: one sketch-bearing exchange, no gram-domain shuffle") {
    // multi-partition source (a single-partition test read satisfies any
    // distribution and plans zero exchanges — not the corpus shape)
    val docs = Chain(spark, "docs_rp", table("documents").df.repartition(4))
    val ch = docs.topNgramsSketch("text", n = 2, k = 25, groupBy = Seq("lang"))
    // initialPlan, not inputPlan: EnsureRequirements adds the agg exchange
    val plan = ch.df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the explicit round-robin + ONE group-keyed exchange moving partial
    // sketch buffers; NO exchange may carry the exploded gram column —
    // that full-domain shuffle is exactly what this face deletes
    assert(exchanges.size == 2, s"round-robin + sketch exchange, got ${exchanges.size}")
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name.contains("_gram")),
        s"an exchange carries the gram domain: ${e.output.map(_.name)}")
    }
    ch.assertScaleSafe()
    // exact face for contrast: its exchange IS keyed by the gram census
    val exact = docs.topNgrams("text", n = 2, k = 25, groupBy = Seq("lang"))
    exact.assertScaleSafe()
  }

  test("freq_union scalar: null-coalescing pairwise merge, exact in the exact regime") {
    val a = Seq("x", "x", "y").toDF("v")
      .agg(graft.functions.FreqSketches.sketchAgg(col("v"), 64).as("sk"))
    val b = Seq("x", "z").toDF("v")
      .agg(graft.functions.FreqSketches.sketchAgg(col("v"), 64).as("sk"))
    val merged = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(explode(graft.functions.FreqSketches.topK(
        graft.functions.FreqSketches.union(col("sk"), col("sk2")), 10)).as("h"))
      .select(col("h.item"), col("h.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
    // null coalescing: one absent side adopts the other
    val oneNull = a.select(graft.functions.FreqSketches.union(
      col("sk"), lit(null).cast("binary")).as("u"))
      .select(explode(graft.functions.FreqSketches.topK(col("u"), 10)).as("h"))
      .select("h.item").collect().map(_.getString(0)).toSet
    assert(oneNull == Set("x", "y"))
    // SQL spelling resolves through the registry
    val viaSql = spark.sql(
      "SELECT freq_topk(freq_union(freq_sketch_agg(v, 64), CAST(NULL AS BINARY)), 1)[0].est " +
        "FROM VALUES ('a'), ('a') AS t(v)").collect()(0).getLong(0)
    assert(viaSql == 2L)
  }

  test("freq-sketch sink accumulates across batches and converges to the batch face") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val base = 1704067200L * 1000000000L
    def evt(id: Long, tpe: String, user: Long) =
      Evt(id, base + id * 60L * 1000000000L, user, tpe, 1.0, "{}")
    spark.sql("DROP TABLE IF EXISTS freq_profile_t")
    var seen = Seq.empty[Evt]
    def drain(events: Evt*): Unit = {
      seen = seen ++ events
      val ms = MemoryStream[Evt]
      ms.addData(events: _*)
      EventStreams.sinkFreqSketchToTable(ms.toDF(), Seq("event_type"), "user_id",
        "freq_profile_t",
        java.nio.file.Files.createTempDirectory("graft_ckpt_fq").toString,
        maxMapSize = 64, profileBuckets = 4)
      val got = rows(spark.table("freq_profile_t")
        .select(col("event_type"),
          explode(graft.functions.FreqSketches.topK(col("_sk"), 3)).as("h"))
        .select(col("event_type"), col("h.item"), col("h.est")))
      val want = rows(seen.toDF().groupBy("event_type")
        .agg(graft.functions.FreqSketches
          .sketchAgg(col("user_id").cast("string"), 64).as("_sk"))
        .select(col("event_type"),
          explode(graft.functions.FreqSketches.topK(col("_sk"), 3)).as("h"))
        .select(col("event_type"), col("h.item"), col("h.est")))
      assert(got == want, s"sink diverged from batch face after ${seen.size} events")
    }
    // batch 1: user 7 clicks 5x, users 1..3 once each; views from user 9
    drain((1L to 5L).map(i => evt(i, "click", 7)) ++
      (1L to 3L).map(u => evt(10 + u, "click", u)) :+
      evt(20, "view", 9): _*)
    // batch 2: user 7 clicks 3 more (additive merge), new type appears
    drain((1L to 3L).map(i => evt(30 + i, "click", 7)) :+
      evt(40, "scroll", 5): _*)
    val top = spark.table("freq_profile_t").where(col("event_type") === "click")
      .select(explode(graft.functions.FreqSketches.topK(col("_sk"), 1)).as("h"))
      .select(col("h.item"), col("h.est")).collect()(0)
    assert(top.getString(0) == "7" && top.getLong(1) == 8L,
      s"user 7 must lead clicks with 8 across batches, got $top")
  }

  test("calibration_profile: hand-verified buckets, ECE, fold/exclusion edges") {
    import graft.ops._
    // bucket 2 (scores 0.25): 4 rows, 1 positive -> perfectly calibrated
    // (pos_rate = score_avg = 0.25, term 0); bucket 9: score 0.95 twice +
    // the score = 1.0 fold, 0 positives -> |0 - avg| * 3 drives the ece;
    // a NaN score and a null label are excluded entirely
    val df = Seq(
      (0.25, Some(1)), (0.25, Some(0)), (0.25, Some(0)), (0.25, Some(0)),
      (0.95, Some(0)), (0.95, Some(0)), (1.0, Some(0)),
      (Double.NaN, Some(1)), (0.5, None)).toDF("score", "label")
    val out = Chain(spark, "cal0", df).calibrationProfile("score", "label", 10)
    val rowsM = out.df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rowsM.size == 10, "spine-complete: every bucket present")
    assert(rowsM(2L).getLong(3) == 4L && rowsM(2L).getDouble(5) == 0.25 &&
      rowsM(2L).getDouble(4) == 0.25, "calibrated bucket: pos_rate = score_avg")
    assert(rowsM(9L).getLong(3) == 3L, "score = 1.0 folds into the top bucket")
    assert(rowsM(9L).getDouble(5) == 0.0)
    assert(rowsM(0L).getLong(3) == 0L && rowsM(0L).isNullAt(4) && rowsM(0L).isNullAt(5),
      "empty bucket: n = 0 with null stats")
    // ece = (floor(3 * |0 - (0.95+0.95+1.0)/3| * 1e6 + .5)/1e6) / 7
    val avg9 = (0.95 + 0.95 + 1.0) / 3
    val want = math.floor(3 * avg9 * 1e6 + 0.5) / 1e6 / 7
    val got = rowsM(2L).getDouble(6)
    // tolerance = one quantization step: the op's exact-decimal score sum
    // and this hand replay may differ by an ulp before the 1e-6 floor
    assert(math.abs(got - want) < 2e-6, s"ece $got vs $want")
    assert(rowsM.values.map(_.getDouble(6)).toSet.size == 1, "ece repeats per group")
    df.createOrReplaceTempView("cal0")
    assert(rows(spark.sql(out.sql())) == rows(out.df), "SQL face diverged")
  }

  test("calibration_profile grouped: per-group ece; a no-valid-rows group reads null") {
    import graft.ops._
    val df = Seq(("a", 0.5, 1), ("a", 0.5, 0), ("b", Double.NaN, 1))
      .toDF("g", "score", "label")
    val out = Chain(spark, "cal1", df)
      .calibrationProfile("score", "label", 4, groupBy = Seq("g"))
    val got = out.df.collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(got.size == 8, "2 groups x 4 spine buckets")
    assert(got(("a", 2L)).getLong(4) == 2L)
    // group a: one bucket, pos_rate 0.5 = score_avg 0.5 -> ece exactly 0
    assert(got(("a", 2L)).getDouble(7) == 0.0)
    assert(got(("b", 0L)).isNullAt(7), "all-excluded group: null ece, no zero-divide")
    df.createOrReplaceTempView("cal1")
    assert(rows(spark.sql(out.sql())) == rows(out.df))
    out.assertScaleSafe()
  }

  test("rrf_fuse: hand-verified fusion, one-sided docs, tie-break by id, k cap") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2),
      (2L, 21L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Chain(spark, "rrf_a", a).rrfFuse(Chain(spark, "rrf_b", b), k = 3)
      .df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3))))
      .toMap
    def c(r: Int) = 1.0 / (60.0 + r)
    // doc 11 appears in both lists (ranks 2 and 1); 10/12/13 one-sided
    assert(out((1L, 11L)) == ((c(2) + c(1), 1)))
    assert(out((1L, 10L)) == ((c(1), 2)))
    assert(out((1L, 13L)) == ((c(2), 3)))
    assert(!out.contains((1L, 12L)), "k = 3 must cap the fused list")
    // query 2: equal one-sided contributions tie — doc_id ascending wins
    assert(out((2L, 20L))._2 == 1 && out((2L, 21L))._2 == 2)
    assert(out((2L, 20L))._1 == out((2L, 21L))._1)
  }

  test("rrf_fuse scale shape: query-keyed join + bounded per-query window") {
    val docs = table("documents")
    val qs = Chain(spark, "rrf_q", docs.df.where(col("doc_id") < 3))
    val raw = docs.searchTfidf(qs, "doc_id", "text", "doc_id", "text", k = 5)
    val lg = docs.searchTfidf(qs, "doc_id", "text", "doc_id", "text", k = 5,
      idf = "log")
    val fused = raw.rrfFuse(lg, k = 5)
    fused.assertScaleSafe()
    assert(fused.df.columns.toSeq == Seq("query_id", "doc_id", "rrf", "rank"))
    // every fused rank list is dense 1..k' per query
    val byQ = fused.df.collect().groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length),
        s"query $q ranks not dense")
    }
  }

  test("freq-sketch sink: an all-empty stream never creates the table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS freq_profile_empty_t")
    val ms = MemoryStream[Evt]
    EventStreams.sinkFreqSketchToTable(ms.toDF(), Seq("event_type"), "user_id",
      "freq_profile_empty_t",
      java.nio.file.Files.createTempDirectory("graft_ckpt_fqe").toString)
    assert(!spark.catalog.tableExists("freq_profile_empty_t"))
  }
}
