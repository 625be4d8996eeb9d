package graft.ext

import graft.core.{Chain, Exact}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: MinHash+LSH,
  * SimHash, exact n-gram Jaccard, and embedding-cosine — each as a
  * candidate-pair producer `(id_a, id_b, score)`.
  *
  * Scale posture: MinHash/SimHash are the 100 TB paths — candidate
  * generation is a shuffle on band buckets (no O(n²) pair space); oversized
  * buckets (degenerate bands) are dropped with a declared cap, the standard
  * guard against hot keys. The exact-Jaccard op is the verification/oracle
  * path and is only all-pairs when given no candidate set.
  */
final class DedupOps(private val c: Chain) extends AnyVal {
  import DedupOps._

  /** minhash_lsh(id, text): word-shingle MinHash signatures banded into
    * buckets; pairs sharing a band bucket are emitted with their estimated
    * Jaccard (fraction of agreeing minhashes). numHashes = bands × rows.
    */
  def minhashLsh(
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      numHashes: Int = 32,
      bands: Int = 4,
      estThreshold: Double = 0.8,
      maxBucket: Int = 1000): Chain = {
    val rows = numHashes / bands
    val sh = shingles(col(textCol), shingleWords)
    // signature via the native codegen MinHashSignature kernel (one pass,
    // two hashes per shingle); the repartition is a materialization barrier
    // so neither the band projection nor either bucket-join side re-derives
    // it (they share a ReusedExchange)
    val sigs = c.df.select(col(idCol).as("_id"),
      graft.functions.Sketches.minhashSignature(sh, numHashes).as("_mh"))
      .repartition(col("_id"))
    val banded = sigs.select(col("_id"), col("_mh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b) +: (0 until rows).map(r => col("_mh")(b * rows + r)): _*)): _*))
        .as(Seq("_band", "_bh")))
    // drop degenerate buckets (declared cap — hot-key guard)
    val sized = banded
      .withColumn("_bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_band"), col("_bh"))))
      .where(col("_bsz") <= maxBucket)
    val l = sized.select(col("_band"), col("_bh"), col("_id").as("id_a"), col("_mh").as("_mha"))
    val r = sized.select(col("_band"), col("_bh"), col("_id").as("id_b"), col("_mh").as("_mhb"))
    val pairs = l.join(r, Seq("_band", "_bh")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("_mha"), col("_mhb"), (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= estThreshold)
    c.next("dedup_minhash", pairs, None)
  }

  /** simhash(id, text): 64-bit token-hash sign sketch; candidate pairs share
    * one of four 16-bit bands and have Hamming distance ≤ maxHamming.
    */
  def simhashPairs(
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): Chain = {
    // native codegen SimHash64 kernel over the token array; barrier so the
    // band projection and both join sides read the materialized signature
    val withSig = c.df.select(col(idCol).as("_id"),
      graft.functions.Sketches.simhash64(TextOps.tokens(col(textCol))).as("_sim"))
      .repartition(col("_id"))
    val banded = withSig.select(col("_id"), col("_sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("_sim"), b * 16).bitwiseAND(lit(0xffffL))): _*)).as(Seq("_band", "_bh")))
    val sized = banded
      .withColumn("_bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_band"), col("_bh"))))
      .where(col("_bsz") <= maxBucket)
    val l = sized.select(col("_band"), col("_bh"), col("_id").as("id_a"), col("_sim").as("_sa"))
    val r = sized.select(col("_band"), col("_bh"), col("_id").as("id_b"), col("_sim").as("_sb"))
    val pairs = l.join(r, Seq("_band", "_bh")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_sa").bitwiseXOR(col("_sb"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
    c.next("dedup_simhash", pairs, None)
  }

  /** ngram_jaccard(id, text): exact word n-gram set Jaccard between all
    * pairs sharing at least one shingle, thresholded.
    *
    * Inverted-index formulation — explode shingles, equi-join on the
    * shingle, count matches per pair, then |A∪B| = |A|+|B|−|A∩B|. No cross
    * join: pair space is only pairs that actually share a shingle, and the
    * join is a shuffle on the shingle key. `maxDocFreq` drops shingles that
    * occur in more than that many documents before pairing (the standard
    * hot-shingle guard at scale; changes results only for pairs whose
    * overlap is entirely stop-shingles, so leave at MaxValue for exactness).
    */
  def ngramJaccardPairs(
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.9,
      maxDocFreq: Int = Int.MaxValue): Chain = {
    val sh = array_distinct(shingles(col(textCol), n))
    // repartition = shuffle-materialization barrier: shingle arrays are
    // computed once per document, not re-derived on each join side
    val side = c.df.select(col(idCol).as("_id"), sh.as("_sh"))
      .repartition(col("_id"))
    val sizes = side.select(col("_id"), size(col("_sh")).as("_sz"))
    val ex = side.select(col("_id"), explode(col("_sh")).as("_s"))
    val filtered =
      if (maxDocFreq == Int.MaxValue) ex
      else ex.withColumn("_df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_s"))))
        .where(col("_df") <= maxDocFreq).drop("_df")
    val l = filtered.select(col("_id").as("id_a"), col("_s"))
    val r = filtered.select(col("_id").as("id_b"), col("_s"))
    val common = l.join(r, Seq("_s")).where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("_inter"))
    val pairs = common
      .join(sizes.select(col("_id").as("id_a"), col("_sz").as("_sza")), Seq("id_a"))
      .join(sizes.select(col("_id").as("id_b"), col("_sz").as("_szb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("_inter").cast("double") /
          (col("_sza") + col("_szb") - col("_inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
    c.next("dedup_ngram_jaccard", pairs, None)
  }

  /** embedding_cosine_pairs(id, vec): near-duplicate pairs by exact cosine
    * over an embedding column. All-pairs verification path (exact decimal
    * dot products — partitioning-independent); the scale path is
    * [[SimilarityOps.lshCosineTopK]]'s hyperplane buckets.
    */
  def embeddingCosinePairs(idCol: String, vecCol: String, threshold: Double): Chain = {
    val withNorm = c.df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_norm", sqrt(Exact.dot(col("_v"), col("_v"))))
      // materialization barrier: norms computed once per vector, not per pair
      .repartition(col("_id"))
    val l = withNorm.select(col("_id").as("id_a"), col("_v").as("_va"), col("_norm").as("_na"))
    val r = withNorm.select(col("_id").as("id_b"), col("_v").as("_vb"), col("_norm").as("_nb"))
    val cos = Exact.dot(col("_va"), col("_vb")) / col("_na") / col("_nb")
    val pairs = l.crossJoin(r).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cos.as("cosine"))
      .where(col("cosine") >= threshold)
    c.next("dedup_embedding", pairs, None)
  }
}

object DedupOps {
  /** Word n-gram shingles; documents shorter than n words fall back to the
    * whole token array joined (one shingle).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }
}
