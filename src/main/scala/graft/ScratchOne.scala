package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run a single SparkEntry query and dump parquet — handy for
  * timing or inspecting one query without the full Verify/Bench sweep.
  * Not part of the library surface.
  */
object ScratchOne {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: graft.ScratchOne <query_name> <sf_dir> <out_dir>")
      System.err.println(s"  query_name one of: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val Seq(name, sfDir, outDir) = args.toSeq
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    val t1 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    val t2 = System.nanoTime()
    println(f"[scratch] $name cold ${(t1 - t0) / 1e9}%.3f s, warm ${(t2 - t1) / 1e9}%.3f s")
    spark.stop()
  }
}
