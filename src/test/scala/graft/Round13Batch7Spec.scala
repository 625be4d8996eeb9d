package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for the round-13 seventh batch: frequency encoding and m-estimate
  * smoothed target encoding.
  */
class Round13Batch7Spec extends AnyFunSuite {
  import spark.implicits._

  test("frequencyEncode: counts and shares; null is a category; SQL face agrees") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None, None).toDF("c")
    val counts = Chain(spark, "fe1", df).frequencyEncode("c")
    val gotC = counts.df.collect().map(r =>
      (if (r.isNullAt(0)) "null" else r.getString(0)) -> r.getLong(1)).toMap
    assert(gotC == Map("a" -> 2L, "b" -> 1L, "null" -> 3L), s"got $gotC")
    val shares = Chain(spark, "fe1", df).frequencyEncode("c", normalize = true)
    val gotS = shares.df.collect().map(r =>
      (if (r.isNullAt(0)) "null" else r.getString(0)) -> r.getDouble(1)).toMap
    assert(gotS("a") == 2.0 / 6.0 && gotS("null") == 0.5, s"got $gotS")
    df.createOrReplaceTempView("fe1")
    assert(rows(spark.sql(counts.sql())) == rows(counts.df))
    assert(rows(spark.sql(shares.sql())) == rows(shares.df))
    intercept[IllegalArgumentException] {
      Chain(spark, "fe2", df).frequencyEncode("missing")
    }
  }

  test("targetEncodeSmoothed: m-estimate hand math, NaN exclusion, SQL face agrees") {
    val df = Seq(("A", 1.0), ("A", 3.0), ("B", 10.0), ("B", Double.NaN))
      .toDF("cat", "y")
    val c = Chain(spark, "tes1", df).targetEncodeSmoothed("cat", "y", m = 1.0)
    val got = c.df.collect().map(r =>
      (r.getString(0), r.getDouble(1).toString) -> r.getDouble(2)).toMap
    // NaN excluded everywhere: global mean = 14/3 over {1, 3, 10}
    val gMean = 14.0 / 3.0
    val expA = (4.0 + 1.0 * gMean) / (2.0 + 1.0)
    val expB = (10.0 + 1.0 * gMean) / (1.0 + 1.0)
    assert(got(("A", "1.0")) == expA && got(("A", "3.0")) == expA, s"got $got")
    assert(got(("B", "10.0")) == expB && got(("B", "NaN")) == expB,
      "the NaN row still receives its category's encoding")
    df.createOrReplaceTempView("tes1")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    // large m pulls every category toward the global mean
    val heavy = Chain(spark, "tes2", df).targetEncodeSmoothed("cat", "y", m = 1e9)
      .df.collect().map(_.getDouble(2))
    assert(heavy.forall(v => math.abs(v - gMean) < 1e-6))
    intercept[IllegalArgumentException] {
      Chain(spark, "tes3", df).targetEncodeSmoothed("cat", "y", m = 0.0)
    }
  }
}
