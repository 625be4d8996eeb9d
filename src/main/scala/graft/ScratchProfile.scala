package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev utility: profile SparkEntry queries under bench-identical session
  * config — wall time (min over passes) plus scheduler-level counters the
  * timing alone hides: jobs, stages, tasks, shuffle read/write bytes. The
  * counters localize WHERE a query spends (driver barriers vs shuffle
  * volume vs task count) before any optimization is attempted
  * (spark_optimization_guide §1: measure first). Not part of the library
  * surface.
  *
  * usage: graft.ScratchProfile <sf_dir> <passes> [q_name,...]
  */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    // warmup, mirroring Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    println("query,pass,sec,jobs,stages,tasks,shuf_read_mb,shuf_write_mb")
    for (pass <- 1 to passes; name <- names) {
      jobs.set(0); stages.set(0); tasks.set(0); shufRead.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[profile] $name FAILED: ${e.getMessage}"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // listener events drain asynchronously; give the bus a beat
      Thread.sleep(200)
      println(f"$name,$pass,$dt%.3f,${jobs.get},${stages.get},${tasks.get},${shufRead.get / 1048576.0}%.2f,${shufWrite.get / 1048576.0}%.2f" + (if (ok) "" else ",FAILED"))
      System.out.flush()
    }
    spark.stop()
  }
}
