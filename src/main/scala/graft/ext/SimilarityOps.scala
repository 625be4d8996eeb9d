package graft.ext

import graft.core.{Chain, Exact}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `cosineTopK` is the exact baseline: broadcast the (small) query set,
  * stream the corpus once, per-query top-k via window — one shuffle on
  * query_id. `lshCosineTopK` is the scale path: sign-random-projection
  * buckets shrink the candidate set before exact rerank, trading recall for
  * a corpus-partitionable join (the IVF/LSH pattern).
  */
final class SimilarityOps(private val c: Chain) extends AnyVal {

  /** Exact cosine top-k of each query vector against the corpus (this
    * chain). Queries are broadcast; dot products use exact decimal
    * accumulation so ranking is bit-stable across partitionings.
    */
  def cosineTopK(queries: DataFrame, idCol: String, vecCol: String, k: Int): Chain = {
    def withNorm(df: DataFrame, idAs: String, vAs: String, nAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vAs))
        .withColumn(nAs, sqrt(Exact.dot(col(vAs), col(vAs))))
        .repartition(col(idAs)) // barrier: norm computed once, not per pair
    val corpus = withNorm(c.df, "neighbor_id", "_vc", "_nc")
    val qs = withNorm(queries, "query_id", "_vq", "_nq")
    val cos = Exact.dot(col("_vq"), col("_vc")) / col("_nq") / col("_nc")
    val scored = corpus.crossJoin(broadcast(qs))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val df2 = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    c.next("cosine_topk", df2, None)
  }

  /** IVF-flat top-k: coarse-quantize the corpus into `nlist` cells around
    * deterministic hash-seeded centroid vectors (plug a trained k-means for
    * production); each query probes its `nprobe` nearest cells and reranks
    * those candidates with exact cosine. Candidate volume ≈
    * nprobe/nlist of the corpus per query — the standard recall/cost dial.
    */
  def ivfCosineTopK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
                    nlist: Int = 16, nprobe: Int = 4): Chain = {
    val corpus = c.df.select(col(idCol).as("neighbor_id"), col(vecCol).as("_vc"))
      .withColumn("_nc", sqrt(Exact.dot(col("_vc"), col("_vc"))))
      .repartition(col("neighbor_id"))
    // deterministic seed selection: the nlist corpus vectors with the
    // smallest id-hashes act as coarse centroids
    val centroids = corpus
      .select(col("neighbor_id").as("_cid"), col("_vc").as("_cv"), col("_nc").as("_cn"))
      .orderBy(xxhash64(col("_cid")).asc, col("_cid").asc).limit(nlist)
    val simToCentroid = Exact.dot(col("_vc"), col("_cv")) / col("_nc") / col("_cn")
    // assign every corpus vector to its best cell (ties → smallest cid)
    val assignW = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("_cs").desc, col("_cid").asc)
    val assigned = corpus.crossJoin(broadcast(centroids))
      .select(col("neighbor_id"), col("_vc"), col("_nc"), col("_cid"),
        simToCentroid.as("_cs"))
      .withColumn("_rn", row_number().over(assignW)).where(col("_rn") === 1)
      .select(col("neighbor_id"), col("_vc"), col("_nc"), col("_cid"))
    // each query probes its nprobe closest cells
    val qs = queries.select(col(idCol).as("query_id"), col(vecCol).as("_vq"))
      .withColumn("_nq", sqrt(Exact.dot(col("_vq"), col("_vq"))))
    val qSim = Exact.dot(col("_vq"), col("_cv")) / col("_nq") / col("_cn")
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("_qs").desc, col("_cid").asc)
    val probes = qs.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("_vq"), col("_nq"), col("_cid"), qSim.as("_qs"))
      .withColumn("_pr", row_number().over(probeW))
      .where(col("_pr") <= nprobe)
      .select(col("query_id"), col("_vq"), col("_nq"), col("_cid"))
    // exact rerank within probed cells
    val cos = Exact.dot(col("_vq"), col("_vc")) / col("_nq") / col("_nc")
    val scored = assigned.join(broadcast(probes), Seq("_cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.next("cosine_topk_ivf",
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k), None)
  }

  /** LSH top-k: 16 sign-random-projection bits (deterministic ±1 planes
    * from xxhash64), candidates = corpus vectors sharing ≥1 of four 4-bit
    * bands with the query, exact cosine rerank within candidates.
    */
  def lshCosineTopK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
                    planes: Int = 16, bands: Int = 4): Chain = {
    val rows = planes / bands
    def sketch(df: DataFrame, vAs: String): DataFrame = {
      // plane p, dim i: weight = +1 if bit(xxhash64(p, i)) else -1
      val bits = (0 until planes).map { p =>
        val s = aggregate(
          zip_with(col(vAs),
            transform(sequence(lit(0), size(col(vAs)) - 1),
              i => when(xxhash64(lit(p), i).bitwiseAND(lit(1L)) === 1L, 1.0).otherwise(-1.0)),
            (x, w) => x.cast("double") * w),
          lit(0.0), (acc, v) => acc + v)
        when(s > 0, 1).otherwise(0)
      }
      (0 until bands).foldLeft(df) { (d, b) =>
        d.withColumn(s"_band_$b",
          (0 until rows).map(r => bits(b * rows + r) * (1 << r)).reduce(_ + _))
      }
    }
    def withNorm(df: DataFrame, idAs: String, vAs: String, nAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vAs))
        .withColumn(nAs, sqrt(Exact.dot(col(vAs), col(vAs))))
    val corpus = sketch(withNorm(c.df, "neighbor_id", "_vc", "_nc"), "_vc")
      .repartition(col("neighbor_id")) // barrier before the band join
    val qs = sketch(withNorm(queries, "query_id", "_vq", "_nq"), "_vq")
    val bandMatch = (0 until bands)
      .map(b => corpus(s"_band_$b") === qs(s"_band_$b")).reduce(_ || _)
    val cos = Exact.dot(qs("_vq"), corpus("_vc")) / qs("_nq") / corpus("_nc")
    val scored = corpus.join(broadcast(qs), bandMatch)
      .where(qs("query_id") =!= corpus("neighbor_id"))
      .select(qs("query_id"), corpus("neighbor_id"), cos.as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.next("cosine_topk_lsh",
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k), None)
  }
}
