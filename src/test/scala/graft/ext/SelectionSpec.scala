package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.TestSpark._

/** Gates for the data-selection / retrieval-evaluation family: DSIR
  * importance resampling (model fit, pure-projection scoring, Gumbel
  * top-k) and rank_eval (recall/MRR/nDCG@k), plus the leakage-free
  * grouped split. Beyond the DuckDB oracles, these pin: an independent
  * driver-side replay of the model arithmetic, the one-scan/zero-shuffle
  * scoring plan, metric hand-computations, and the guards.
  */
class SelectionSpec extends AnyFunSuite {
  import spark.implicits._

  // ---- independent md5/hex8 replay (java MessageDigest, not Spark) ----

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hex8Of(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)

  private def uniBiOf(text: String): Seq[String] = {
    val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private val corpus = Seq(
    (1L, "spark scans tables fast"),
    (2L, "duck db scans tables"),
    (3L, "the quick brown fox"),
    (4L, "the quick brown fox jumps"),
    (5L, "fast spark fast spark")).toDF("doc_id", "text")

  private val target = Seq(
    (10L, "spark scans fast"),
    (11L, "fast spark tables")).toDF("doc_id", "text")

  private val B = 64

  /** Driver-side replay of dsirModel's exact arithmetic. */
  private def replayModel(raw: Seq[String], tgt: Seq[String]): Map[Long, (Long, Long, Long)] = {
    def counts(texts: Seq[String]): Map[Long, Long] =
      texts.flatMap(uniBiOf).map(g => hex8Of(g) % B)
        .groupBy(identity).map { case (b, gs) => b -> gs.size.toLong }
    val rc = counts(raw)
    val tc = counts(tgt)
    val nR = rc.values.sum
    val nT = tc.values.sum
    def fpLog(cnt: Long, tot: Long): Long =
      math.floor(math.log((cnt + 1.0d) / (tot.toDouble + B)) * 1e6 + 0.5).toLong
    (0L until B).map { b =>
      val (ct, cr) = (tc.getOrElse(b, 0L), rc.getOrElse(b, 0L))
      b -> ((ct, cr, fpLog(ct, nT) - fpLog(cr, nR)))
    }.toMap
  }

  test("dsirModel: matches an independent replay of counts and quantized log ratios") {
    val got = Chain(spark, "raw", corpus)
      .dsirModel(Chain(spark, "tgt", target), "text", buckets = B).df
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = replayModel(
      corpus.select("text").as[String].collect().toSeq,
      target.select("text").as[String].collect().toSeq)
    assert(got.size == B)
    assert(got == want)
  }

  test("dsirModel: target == raw makes every weight zero") {
    val ch = Chain(spark, "raw", corpus)
    val m = ch.dsirModel(ch, "text", buckets = B).df.collect()
    assert(m.length == B)
    assert(m.forall(_.getLong(3) == 0L))
    assert(m.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("dsirScore: equals an explicit explode-join replay of the model sum") {
    val raw = Chain(spark, "raw", corpus)
    val model = raw.dsirModel(Chain(spark, "tgt", target), "text", buckets = B)
    val scored = raw.dsirScore(model.df, "text").df
      .select("doc_id", "dsir_n_grams", "dsir_score_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val weights = model.df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = corpus.select("doc_id", "text").collect().map { r =>
      val grams = uniBiOf(r.getString(1))
      (r.getLong(0), grams.size.toLong,
        grams.map(g => weights(hex8Of(g) % B)).sum)
    }.toSet
    assert(scored == want)
  }

  test("native kernels agree with the reference Column formulation gram-for-gram") {
    // DsirBuckets vs explode(uniBi) → hex8(md5)%B, on the documents table
    val docs = table("documents").df
    val native = docs.select(explode(
        graft.functions.DsirBuckets(TextOps.tokens(col("text")), B)).as("b"))
      .groupBy("b").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val reference = docs.select(explode(SelectionOps.uniBi(col("text"))).as("g"))
      .select(SelectionOps.gramBucket(col("g"), B).as("b"))
      .groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == reference)
    // DsirScore vs the same weights summed through the Column route
    val weights = (0 until B).map(i => (i * 31 - 97).toLong).toArray
    val wMap = weights.zipWithIndex.map { case (w, i) => i.toLong -> w }.toMap
    val nativeScores = docs.select(col("doc_id"),
        graft.functions.DsirScore(TextOps.tokens(col("text")), weights).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refScores = docs.select(col("doc_id"), explode(SelectionOps.uniBi(col("text"))).as("g"))
      .select(col("doc_id"), SelectionOps.gramBucket(col("g"), B).as("b"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => wMap(r.getLong(1))).sum }
    assert(nativeScores == refScores)
  }

  test("dsirScore: pure projection — one corpus scan, zero shuffles") {
    val docs = table("documents")
    val model = docs.dsirModel(docs.filterRows(Seq("doc_id % 2 = 0")), "text", buckets = B)
    val plan = docs.dsirScore(model.df, "text").df.queryExecution.executedPlan
    assert(countScans(plan) == 1, s"expected ONE corpus scan:\n$plan")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"scoring must not shuffle:\n$plan")
  }

  test("dsirScore: guards — reserved output names, malformed model frames") {
    val raw = Chain(spark, "raw", corpus)
    val model = raw.dsirModel(Chain(spark, "tgt", target), "text", buckets = B)
    val clash = Chain(spark, "clash", corpus.withColumn("dsir_score_fp", lit(1L)))
    assertThrows[IllegalArgumentException](clash.dsirScore(model.df, "text"))
    // non-contiguous bucket range
    val holey = model.df.where("bucket <> 3")
    assertThrows[IllegalArgumentException](raw.dsirScore(holey, "text"))
    // duplicate bucket
    val dup = model.df.union(model.df.limit(1))
    assertThrows[IllegalArgumentException](raw.dsirScore(dup, "text"))
    assertThrows[IllegalArgumentException](
      raw.dsirModel(Chain(spark, "tgt", target), "text", buckets = 7))
  }

  test("dsirSelect: returns exactly k rows — the top-k of score + deterministic Gumbel") {
    val raw = Chain(spark, "raw", corpus)
    val tgt = Chain(spark, "tgt", target)
    val sel = raw.dsirSelect(tgt, "text", k = 3, keyCols = Seq("doc_id"), buckets = B).df
    assert(sel.count() == 3)
    // independent replay: score + gumbel from the same md5 derivation
    val weights = raw.dsirModel(tgt, "text", buckets = B).df
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val keyed = corpus.select("doc_id", "text").collect().map { r =>
      val score = uniBiOf(r.getString(1)).map(g => weights(hex8Of(g) % B)).sum
      val u = (hex8Of(s"gumbel|${r.getLong(0)}") + 0.5) / 4294967296.0
      val gum = math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
      (r.getLong(0), score + gum)
    }
    val want = keyed.sortBy { case (id, key) => (-key, id) }.take(3).map(_._1).toSet
    assert(sel.select("doc_id").as[Long].collect().toSet == want)
    // and the run is reproducible
    val again = raw.dsirSelect(tgt, "text", k = 3, keyCols = Seq("doc_id"), buckets = B).df
    assert(again.select("doc_id").as[Long].collect().toSet == want)
  }

  // ---- rankEval -------------------------------------------------------

  private def fpq(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
  private def gainAt(r: Long): Long = fpq(1.0 / (math.log(r + 1.0) / math.log(2.0)))

  test("rankEval: hand-computed metrics — hits, misses, and unjudged queries") {
    val run = Seq(
      (1L, 101L, 1), (1L, 999L, 2), (1L, 102L, 3), (1L, 998L, 4), (1L, 997L, 5),
      (2L, 999L, 1), (2L, 998L, 2), // judged query, zero hits
      (3L, 101L, 1) // UNJUDGED query: must be excluded
    ).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 555L), (2L, 556L)).toDF("query_id", "doc_id")
    val got = Chain(spark, "run", run)
      .rankEval(Chain(spark, "qrels", qrels), "query_id", "doc_id", "rank", k = 5).df
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet == Set(1L, 2L), "unjudged query 3 must be excluded")
    val dcg1 = gainAt(1) + gainAt(3)
    val idcg1 = gainAt(1) + gainAt(2) + gainAt(3)
    assert(got(1L) == ((3L, 2L, fpq(2.0 / 3.0), fpq(1.0), dcg1, idcg1,
      fpq(dcg1.toDouble / idcg1.toDouble))))
    val idcg2 = gainAt(1) + gainAt(2)
    assert(got(2L) == ((2L, 0L, 0L, 0L, 0L, idcg2, 0L)))
  }

  test("rankEval: ranks beyond k and duplicate qrels don't count") {
    val run = Seq((1L, 101L, 7)).toDF("query_id", "doc_id", "rank") // hit, but rank 7 > k
    val qrels = Seq((1L, 101L), (1L, 101L)).toDF("query_id", "doc_id") // dup judgment
    val got = Chain(spark, "run", run)
      .rankEval(Chain(spark, "qrels", qrels), "query_id", "doc_id", "rank", k = 5).df
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 1L, "duplicate judgments must collapse")
    assert(got.head.getLong(2) == 0L, "a hit past k is not a hit")
  }

  test("rankEval: reserved metric names are guarded") {
    val run = Seq((1L, 1L, 1, 9L)).toDF("query_id", "doc_id", "rank", "hits")
    val qrels = Seq((1L, 1L)).toDF("query_id", "doc_id")
    assertThrows[IllegalArgumentException](Chain(spark, "run", run)
      .rankEval(Chain(spark, "qrels", qrels), "query_id", "doc_id", "rank", k = 5))
  }

  // ---- trainTestSplitByGroup -----------------------------------------

  test("trainTestSplitByGroup: every group lands whole in one half, by the md5 threshold") {
    val docs = table("documents")
    val got = docs.trainTestSplitByGroup(Seq("source"), 0.5).df
      .select("source", "tt_split").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1))
    // one label per group
    assert(got.map(_._1).distinct.length == got.length, "a group straddled the split")
    // the label is the md5-threshold decision (hashThreshold(0.5) = 8·16^14)
    got.foreach { case (src, label) =>
      val expect = if (md5Hex(src) < "800000000000000") "TRAIN" else "TEST"
      assert(label == expect, s"group $src")
    }
    assertThrows[IllegalArgumentException](
      docs.trainTestSplitByGroup(Seq("source"), 1.0))
  }

  test("trainTestSplitByGroup: SQL face agrees with the DataFrame face") {
    val docs = table("documents")
    val ch = docs.trainTestSplitByGroup(Seq("source", "lang"), 0.3)
    assert(rows(spark.sql(ch.sql())) == rows(ch.df))
  }
}
