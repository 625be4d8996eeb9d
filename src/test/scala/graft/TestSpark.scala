package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Chain

/** One shared local session for the whole suite (Spark startup is ~5s;
  * per-suite sessions would dominate test time).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // same function surface a production session gets from
    // spark.sql.extensions=graft.functions.GraftExtensions
    graft.functions.GraftFunctions.register(s)
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  def table(name: String): Chain = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.createOrReplaceTempView(name)
    Chain(spark, name, df)
  }

  def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq
}
