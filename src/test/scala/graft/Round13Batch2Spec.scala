package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ext._
import TestSpark._

/** Gates for the round-13 second batch: fixed-point integer PageRank
  * (`linkRank` — crawl-authority prior, engine-exact by construction) and
  * MMR diversified rerank (`mmrRerank` — the retrieval→context-window
  * dedup step). Both are iterative multi-frame ops, so beyond the DuckDB /
  * pinned oracles the specs pin the independent recurrence replay, the
  * partitioning invariance the integer/exact-decimal arithmetic buys, and
  * the refusal guards.
  */
class Round13Batch2Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- linkRank ------------------------------------------------------------

  private val edgeFixture = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (2L, 5L),
    (1L, 2L)) // duplicate edge: must collapse before degrees are counted
    .toDF("src", "dst")

  /** Independent driver-side replay of the exact integer recurrence. */
  private def replayRank(edges: Set[(Long, Long)], iterations: Int,
                         dampingPct: Long, scale: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val tele = ((100L - dampingPct) * scale) / (100L * n)
    var pr = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iterations) {
      val dang = nodes.filterNot(out.contains).map(pr).sum
      val contrib = edges.toSeq.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / out(s) }.sum
      }
      pr = nodes.map(v =>
        v -> (tele + (dampingPct * (contrib.getOrElse(v, 0L) + dang / n)) / 100L)).toMap
    }
    pr
  }

  test("linkRank: matches an independent replay of the integer recurrence exactly") {
    val got = Chain(spark, "lr", edgeFixture)
      .linkRank("src", "dst", iterations = 3).df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = replayRank(
      Set((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (2L, 5L)),
      iterations = 3, dampingPct = 85L, scale = 1000000000000L)
    assert(got == want, s"got $got\nwant $want")
    // node 5 is dangling (no out-edges) and node 4 has no in-edges: 4 must
    // sit at the teleport+dangling floor, the 1-2-3 cycle above it
    assert(got(4L) < got(1L) && got(4L) < got(2L) && got(4L) < got(3L))
  }

  test("linkRank: rank mass is conserved up to truncation; double readout is rank_fp/scale") {
    val df = Chain(spark, "lrm", edgeFixture).linkRank("src", "dst", iterations = 4).df
    val rows = df.collect()
    val total = rows.map(_.getLong(1)).sum
    val scale = 1000000000000L
    // each division truncates < 1 fixed-point unit; with 5 nodes + 6 edges
    // per sweep the loss is comfortably under 100 units per sweep
    assert(total <= scale && total > scale - 4 * 100L,
      s"mass $total out of the truncation envelope around $scale")
    rows.foreach(r => assert(r.getDouble(2) == r.getLong(1) / scale.toDouble))
  }

  test("linkRank: bit-identical across input partitionings (integer arithmetic only)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Chain(spark, "lrp", df).linkRank("src", "dst", iterations = 3).df
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(edgeFixture.repartition(7)) == run(edgeFixture.coalesce(1)))
  }

  test("linkRank: null endpoints drop, empty graph completes empty") {
    val withNulls = Seq((Some(1L), Some(2L)), (Some(2L), None), (None, Some(1L)))
      .toDF("src", "dst")
    val got = Chain(spark, "lrn", withNulls).linkRank("src", "dst", 2).df.collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L, 2L),
      "only the non-null edge's endpoints rank")
    val empty = Chain(spark, "lre",
      Seq.empty[(Long, Long)].toDF("src", "dst")).linkRank("src", "dst", 2).df
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("node", "rank_fp", "rank"))
  }

  test("linkRank: guards — iteration/damping/scale bounds, schema mismatches; non-renderable") {
    val c = Chain(spark, "lrg", edgeFixture)
    intercept[IllegalArgumentException](c.linkRank("src", "dst", 0))
    intercept[IllegalArgumentException](c.linkRank("src", "dst", 51))
    intercept[IllegalArgumentException](c.linkRank("src", "dst", 3, dampingPct = 101))
    intercept[IllegalArgumentException](c.linkRank("src", "dst", 3, scale = 10L))
    intercept[IllegalArgumentException](c.linkRank("src", "nope", 3))
    intercept[IllegalArgumentException](
      Chain(spark, "lrg2", edgeFixture.withColumn("dst", col("dst").cast("string")))
        .linkRank("src", "dst", 3))
    val e = intercept[UnsupportedOperationException](c.linkRank("src", "dst", 2).sql())
    assert(e.getMessage.contains("link_rank"))
  }

  test("linkRank: lint-safe over a parquet edge source") {
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val df = Chain(spark, "lrl", lineitem
      .select((col("l_orderkey") % 100).as("src"), (col("l_partkey") % 100).as("dst")))
      .linkRank("src", "dst", iterations = 2).df
    graft.core.ScaleLint.assertSafe(df)
    assert(df.count() == 100)
  }

  // ---- mmrRerank -----------------------------------------------------------

  /** c1 ∥ the query, c2 a near-dup of c1, c3 relevant but on the OTHER
    * side of the query — relevance ranks (c1, c2, c3); MMR at λ=0.5 must
    * spend its second slot on c3 because c2's similarity to the already-
    * picked c1 (~1.0) wipes out its relevance edge.
    */
  private val mmrFixture = Seq(
    (1L, Seq(1.0f, 0.0f)),     // the query
    (2L, Seq(1.0f, 0.1f)),     // c1: rel ≈ 0.995
    (3L, Seq(1.0f, 0.11f)),    // c2: rel ≈ 0.994, cos(c1,c2) ≈ 1.0
    (4L, Seq(0.8f, -0.6f)))    // c3: rel = 0.8, cos(c1,c3) ≈ 0.74
    .toDF("vec_id", "embedding")

  test("mmrRerank: diversity term overrides raw relevance order") {
    val corpus = Chain(spark, "mmr", mmrFixture)
    val q = mmrFixture.where("vec_id = 1")
    val topk = corpus.cosineTopK(q, "vec_id", "embedding", 3).df
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(topk == Seq(2L, 3L, 4L), "relevance alone ranks the near-dup second")
    val mmr = corpus.mmrRerank(q, "vec_id", "embedding", k = 3, poolK = 3,
      lambdaPct = 50).df.orderBy("mmr_rank").collect()
    assert(mmr.map(_.getLong(1)).toSeq == Seq(2L, 4L, 3L),
      "MMR pick 2 must leave the near-dup pair for the diverse candidate")
    assert(mmr.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("mmrRerank: λ=100 degrades to pure relevance — exactly cosineTopK's picks") {
    val emb = table("embeddings")
    val q = emb.df.where("vec_id < 3")
    val mmr = emb.mmrRerank(q, "vec_id", "embedding", k = 5, poolK = 5,
      lambdaPct = 100).df
      .select(col("query_id"), col("neighbor_id"), col("mmr_rank"))
    val topk = emb.cosineTopK(q, "vec_id", "embedding", 5).df
      .select(col("query_id"), col("neighbor_id"), col("rank").as("mmr_rank"))
    assert(rows(mmr) == rows(topk))
  }

  test("mmrRerank: a pool smaller than k yields the whole pool with contiguous ranks") {
    val corpus = Chain(spark, "mmr_s", mmrFixture)
    val q = mmrFixture.where("vec_id = 1")
    val got = corpus.mmrRerank(q, "vec_id", "embedding", k = 5, poolK = 5,
      lambdaPct = 50).df.orderBy("mmr_rank").collect()
    assert(got.length == 3, "only 3 candidates exist besides the query")
    assert(got.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("mmrRerank: bit-identical across partitionings (exact-decimal pairwise scores)") {
    val emb = table("embeddings")
    val q = emb.df.where("vec_id < 5")
    def run(df: org.apache.spark.sql.DataFrame) =
      Chain(spark, "mmr_p", df).mmrRerank(q, "vec_id", "embedding", k = 5,
        poolK = 15, lambdaPct = 50).df
        .select("query_id", "neighbor_id", "mmr_rank")
        .collect().map(_.toString).toSet
    assert(run(emb.df.repartition(13)) == run(emb.df.coalesce(1)))
  }

  test("mmrRerank: guards and non-renderable face") {
    val corpus = Chain(spark, "mmr_g", mmrFixture)
    val q = mmrFixture.where("vec_id = 1")
    intercept[IllegalArgumentException](
      corpus.mmrRerank(q, "vec_id", "embedding", k = 0))
    intercept[IllegalArgumentException](
      corpus.mmrRerank(q, "vec_id", "embedding", k = 5, poolK = 3))
    intercept[IllegalArgumentException](
      corpus.mmrRerank(q, "vec_id", "embedding", k = 1, poolK = 1001))
    intercept[IllegalArgumentException](
      corpus.mmrRerank(q, "vec_id", "embedding", k = 1, lambdaPct = 101))
    val e = intercept[UnsupportedOperationException](
      corpus.mmrRerank(q, "vec_id", "embedding", k = 2, poolK = 3).sql())
    assert(e.getMessage.contains("mmr_rerank"))
  }
}
