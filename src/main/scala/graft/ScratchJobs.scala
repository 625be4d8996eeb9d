package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev utility: run ONE SparkEntry query and print every Spark job's
  * callsite + stage/task counts — localizes driver-barrier explosions
  * the aggregate profile can't attribute. Not part of the library surface.
  *
  * usage: graft.ScratchJobs <sf_dir> <q_name>
  */
object ScratchJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
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
    val t0 = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val dt = (System.nanoTime() - t0.get) / 1e9
        println(f"[job] +$dt%7.3fs id=${j.jobId}%3d stages=${j.stageInfos.size} tasks=${j.stageInfos.map(_.numTasks).sum} site=$site")
      }
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    println(s"==== $name ====")
    t0.set(System.nanoTime())
    SparkEntry.queries(name)(spark, sfDir).count()
    println(f"==== total ${(System.nanoTime() - t0.get) / 1e9}%.3f s ====")
    Thread.sleep(500)
    spark.stop()
  }
}
