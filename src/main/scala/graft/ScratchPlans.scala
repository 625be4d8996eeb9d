package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for a list of SparkEntry
  * queries into files (plans/<tag>/<query>_<suffix>.txt) — the
  * before/after plan evidence an optimization round commits. Not part of
  * the library surface.
  *
  * usage: graft.ScratchPlans <sf_dir> <out_dir> <suffix> [q_name,...]
  */
object ScratchPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScratchPlans <sf_dir> <out_dir> <suffix> [q_name,...]")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").toSeq
      else SparkEntry.queries.keys.toSeq
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        // chain-build side effects (checkpoints) must not leak across dumps
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.err.println(s"[plans] wrote ${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
