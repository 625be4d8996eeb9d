package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** End-to-end training-data pipeline: the operators composing the way a
  * real corpus build runs them — scrub → quality/repetition filters →
  * language ID → exact dedup → near-dup clustering → decontamination →
  * chunking → pack assembly → partitioned save. Asserts the funnel shape
  * (each pruning stage only removes rows) and the final layout invariants.
  */
class PipelineSpec extends AnyFunSuite {

  test("the flagship entry() pipeline produces rows (the driver's smoke check)") {
    // join -> datetrunc -> rename -> aggregate -> lag -> moving_avg ->
    // target_encode -> impute -> train_test_split over sf0.001; the driver
    // gates rows > 0 every round — pin it here so an internals change in
    // any composed op (impute fills, Exact stats, window naming) cannot
    // silently zero the flagship between rounds
    val n = SparkEntry.entry(spark).count()
    assert(n > 0, s"entry() must produce rows, got $n")
  }

  test("the full corpus-build funnel composes and lands partitioned") {
    val docs = table("documents")
    val total = docs.df.count()

    // 1. scrub PII/noise, score quality + repetition, keep the good tail
    val scored = docs.scrubText("text")
      .qualityScore("text")
      .repetitionScore("text", n = 3)
    val filtered = scored.filterRows(Seq("quality > 0.3", "text_rep_3 < 0.5"))
    val nFiltered = filtered.df.count()
    assert(nFiltered > 0 && nFiltered <= total)

    // 2. language ID rides along as a partition-to-be column
    val withLang = filtered.langId("text")
    assert(withLang.df.columns.contains("lang_pred"))

    // 3. exact dedup, then near-dup clusters -> keep each cluster's min id
    val deduped = withLang.dedupExact("doc_id", "text")
    val nDeduped = deduped.df.count()
    assert(nDeduped <= nFiltered)
    val clusters = deduped.ngramJaccardPairs("doc_id", "text", n = 3, threshold = 0.5)
      .clusterPairs()
    val drop = clusters.df.where(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val nearDeduped = Chain(spark, "deduped", deduped.df)
      .transformDf("anti_drop")(_.join(drop, Seq("doc_id"), "left_anti"))
    val nNearDeduped = nearDeduped.df.count()
    assert(nNearDeduped <= nDeduped)

    // 4. eval-set decontamination (eval = first 10 doc ids)
    val eval = docs.filterRows(Seq("doc_id < 10"))
    val clean = nearDeduped.flagContaminated(eval, "doc_id", "text", n = 8)
      .filterRows(Seq("NOT contaminated"))
    val nClean = clean.df.count()
    assert(nClean < nNearDeduped, "eval docs present in the corpus must be removed")

    // 5. chunk to training windows, pack to token budgets per language
    val chunks = clean.chunkText("doc_id", "text", chunkTokens = 64, overlap = 16)
    val enriched = Chain(spark, "chunks",
      chunks.df.join(clean.df.select(col("doc_id"), col("lang_pred")), Seq("doc_id")))
    val packed = enriched.packSequences("n_chunk_tokens", 512L,
      orderBy = Seq("doc_id", "chunk_idx"), partitionBy = Seq("lang_pred"))
    // offset binning: every pack's token total stays within budget + one
    // straddling chunk
    val packTotals = packed.df.groupBy("lang_pred", "pack_id")
      .agg(sum("n_chunk_tokens").as("tok")).collect().map(_.getAs[Long]("tok"))
    assert(packTotals.forall(_ <= 512 + 64), s"pack overflow: ${packTotals.max}")

    // 6. land partitioned by language; partition filters prune on read
    spark.sql("DROP TABLE IF EXISTS corpus_packed")
    packed.savePartitioned("corpus_packed", Seq("lang_pred"), overwrite = true)
    val back = spark.table("corpus_packed")
    assert(back.count() == packed.df.count())
    val scan = back.where(col("lang_pred") === "en")
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"))
  }
}
