package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark.spark

/** The probe-broadcast fallback ceiling is an operator choice: a cluster
  * that disabled auto-broadcast as a hard OOM guard can zero
  * `spark.graft.probeBroadcast.maxBytes` and the forced hint disappears
  * (round-16 advice item — before, an 80 MB ceiling was hard-coded over
  * the cluster's explicit no-broadcast posture).
  */
class ProbeBroadcastSpec extends AnyFunSuite {
  import spark.implicits._

  test("spark.graft.probeBroadcast.maxBytes <= 0 disables the forced hint when auto-broadcast is off") {
    val batch = (0 until 8).map(i => (i.toLong, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val probes = batch.select(col("vec_id"), lit(0).as("_cid"))
    def hinted(df: DataFrame): Boolean =
      df.queryExecution.analyzed.collectFirst {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(hinted(SimilarityOps.maybeBroadcastProbes(batch, probes, 1)),
        "default fallback ceiling keeps the hint for a tiny batch")
      spark.conf.set("spark.graft.probeBroadcast.maxBytes", "0")
      try assert(!hinted(SimilarityOps.maybeBroadcastProbes(batch, probes, 1)),
        "a zeroed fallback ceiling must honor the cluster's no-broadcast posture")
      finally spark.conf.unset("spark.graft.probeBroadcast.maxBytes")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
  }

  test("maybeBroadcastSmall: hints under the measured-count cap, never over it or when disabled") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    def hinted(d: DataFrame): Boolean =
      d.queryExecution.analyzed.collectFirst {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    assert(hinted(DedupOps.maybeBroadcastSmall(df, 10L)),
      "a measured count far under the default 1M cap must hint")
    assert(!hinted(DedupOps.maybeBroadcastSmall(df, 2000000L)),
      "a measured count above the default 1M cap must not hint")
    val key = "spark.graft.iterBroadcast.maxRows"
    spark.conf.set(key, "0")
    try assert(!hinted(DedupOps.maybeBroadcastSmall(df, 1L)),
      "cap <= 0 is the hard no-broadcast posture — never hint")
    finally spark.conf.unset(key)
  }
}
