package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.ext._

/** Dev utility: size the round-18 bench SCALING POINT candidates — heavy
  * operator paths over duplicated inputs — before wiring them into
  * Bench. Prints per-candidate wall seconds at the current core count.
  * Not part of the library surface.
  *
  * usage: graft.ScratchScale <sf_dir> [passes]
  */
object ScratchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    for ((name, fn) <- ScaleQueries.all) {
      var best = Double.MaxValue
      for (_ <- 1 to passes) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      println(f"[scale] $name%-32s best=${best}%.3f s")
    }
    spark.stop()
  }
}

/** The bench scaling-point queries (round 18, r17 VERDICT #5): at sf0.1
  * the 255-query suite averages 0.67 s/query — per-job scheduling
  * dominates and the r17 driver measured the 8-core total FASTER than
  * 32-core, so nothing in the suite could exhibit core scaling. These
  * entries re-run a few heavy operator paths over a DUPLICATED input
  * (explode over a literal factor array — one scan, factor× rows;
  * factors chosen so each sits in the compute-bound seconds range at 32
  * cores) so the driver's low-core/high-core comparison has
  * compute-bound points. They are BENCH-ONLY (not declared queries, no
  * oracle — like the recall block) and their keys are x_-prefixed so the
  * q_ baseline/confirmation regex never tracks them; Bench excludes them
  * from the headline total. Measured 2026-08-18 (best-of-2, this host):
  *
  *   | entry | 32c | 8c | 8c/32c |
  *   |---|---|---|---|
  *   | x_scale16_corr_listwise | 2.79 s | 5.45 s | 1.95 (CPU-bound, scales) |
  *   | x_scale128_tfidf_docs | 5.80 s | 7.50 s | 1.29 |
  *   | x_scale16_train_test_split | 3.65 s | 5.24 s | 1.43 |
  *   | x_scale8_quantile_normalize | ~6 s | ~5.5 s | ~0.9 (checkpoint-write + driver-sequenced jobs bound, NOT CPU — the honest PrefixScan storage-burst witness) |
  *
  * A sampleGroupKAgg×32 candidate was measured and dropped: it INVERSE-
  * scaled (11.0 s at 32c vs 4.1 s at 8c — 32 concurrent bounded-heap
  * aggregation tasks GC-thrash on this fixture), which would read as
  * noise, not signal.
  */
object ScaleQueries {
  /** factor-duplicate then round-robin over 2× the session's cores: the
    * sf0.1 parquet inputs are single files well under one 128 MB split,
    * so EVERY scan in the suite is one partition and narrow pipeline
    * stages run single-task no matter the core count (measured: the
    * candidates read the same seconds at 8 and 32 cores without this —
    * and it is also why the 255-query suite's 8-core total beats its
    * 32-core total, the r17 verdict's "unmeasurable scaling" finding).
    * The fan-out makes map-side parallelism proportional to cores, which
    * is exactly what the scaling point must measure. Results stay
    * deterministic: every consumer is partitioning-independent (exact
    * decimal sums, re-sorts, mergeable aggregates).
    */
  private def dup(df: DataFrame, factor: Int): DataFrame = {
    val fanout = df.sparkSession.sparkContext.defaultParallelism * 2
    // repartition BEFORE the explode: the single-partition scan is the
    // one unavoidably serial stage, so only the ORIGINAL rows cross it —
    // the factor× duplication runs post-shuffle on every core
    df.repartition(fanout)
      .withColumn("_rep", explode(lit((0 until factor).toArray))).drop("_rep")
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // exact-decimal CPU (split-long path at this scale)
    "x_scale16_corr_listwise" -> ((s, d) =>
      graft.core.Chain(s, "x_li",
        dup(s.read.parquet(s"$d/lineitem.parquet"), 16))
        .corrMatrix(Seq("l_quantity", "l_extendedprice", "l_discount"),
          deletion = "listwise").df),
    // range-partitioned sort + PrefixScan checkpoint + rank joins
    "x_scale8_quantile_normalize" -> ((s, d) =>
      graft.core.Chain(s, "x_li",
        dup(s.read.parquet(s"$d/lineitem.parquet"), 8))
        .quantileNormalize("l_extendedprice").df),
    // tokenize + (doc, term) aggregation + term-keyed join over 160k
    // distinct-id documents (same vocabulary, 32x the postings)
    "x_scale128_tfidf_docs" -> ((s, d) =>
      graft.core.Chain(s, "x_docs",
        s.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id"), col("text"))
          .repartition(s.sparkContext.defaultParallelism * 2)
          .withColumn("_rep", explode(lit((0 until 128).toArray)))
          .select((col("doc_id") * 128 + col("_rep")).as("doc_id"), col("text")))
        .tfidf("doc_id", "text").df),
    // key-partitioned global sort + split labeling (InternalZip path)
    "x_scale16_train_test_split" -> ((s, d) =>
      graft.core.Chain(s, "x_li",
        dup(s.read.parquet(s"$d/lineitem.parquet"), 16))
        .trainTestSplit(Seq("l_extendedprice" -> "DESC",
          "l_orderkey" -> "ASC", "l_linenumber" -> "ASC"), 0.8).df))
}
