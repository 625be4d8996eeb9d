package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of a SparkEntry query
  * (plan-shape audits for SCALING.md). Not part of the library surface.
  */
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.ScratchExplain <query_name> <sf_dir>")
      sys.exit(2)
    }
    val Seq(name, sfDir) = args.toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"==== $name ====")
    df.explain("formatted")
    spark.stop()
  }
}
