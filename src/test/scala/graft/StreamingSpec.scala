package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import TestSpark._

class StreamingSpec extends AnyFunSuite {

  private def eventsDir(): String = {
    val dir = Files.createTempDirectory("graft_events").toString
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming tumbling agg equals the batch face") {
    val dir = eventsDir()
    val q = EventStreams.streamingTumblingAgg(
      EventStreams.readEventStream(spark, dir), "1 hour", "2 hours", Seq("event_type"))
      .writeStream.format("memory").queryName("t_sink").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = rows(spark.sql(
      "SELECT CAST(window.start AS STRING), event_type, n_events, value_sum FROM t_sink"))
    val batch = EventStreams.tumblingAgg(
      spark.read.parquet(s"$sfDir/events.parquet"), "1 hour", Seq("event_type"))
    val batched = rows(batch.selectExpr(
      "CAST(window_start AS STRING)", "event_type", "n_events", "value_sum"))
    assert(streamed == batched)
  }

  test("batch session windows: gap semantics and end = last + gap") {
    import org.apache.spark.sql.functions._
    val sessions = EventStreams.sessionAgg(
      spark.read.parquet(s"$sfDir/events.parquet"), "30 minutes", Seq("user_id"))
    // session_end - session_start >= 30 minutes always (end = last event + gap)
    val bad = sessions.where(
      col("session_end").cast("timestamp").cast("long") -
        col("session_start").cast("timestamp").cast("long") < 30L * 60)
    assert(bad.count() == 0)
    // events are conserved
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == spark.read.parquet(s"$sfDir/events.parquet").count())
  }
}
