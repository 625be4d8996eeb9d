package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for the round-13 ninth batch: the Bloom-prefiltered join — the
  * 100 TB shape for selective joins whose small side is still too big to
  * broadcast as a hash relation.
  */
class Round13Batch9Spec extends AnyFunSuite {
  import spark.implicits._

  test("joinBloomPrefiltered: result equals the plain inner join, nulls and all") {
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e"), (2L, "b2")).toDF("k", "payload")
      .union(Seq((Option.empty[Long], "nullkey")).toDF("k", "p"))
    val small = Seq((2L, "X"), (4L, "Y"), (9L, "Z")).toDF("sk", "tag")
    val plain = Chain(spark, "jb1", big)
      .join(Chain(spark, "jb2", small), "inner", Seq("k" -> "sk")).df
    val bloom = Chain(spark, "jb1", big)
      .joinBloomPrefiltered(Chain(spark, "jb2", small), Seq("k" -> "sk")).df
    assert(rows(bloom) == rows(plain),
      "bloom prefiltering must be invisible in the result")
  }

  test("joinBloomPrefiltered: the plan carries the might_contain prefilter") {
    val li = table("lineitem")
    val pt = table("part").filterRows(Seq("p_size < 10"))
    val df = li.joinBloomPrefiltered(pt, Seq("l_partkey" -> "p_partkey")).df
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"prefilter must survive into the physical plan")
    // and the result still matches the plain join
    val plain = li.join(pt, "inner", Seq("l_partkey" -> "p_partkey")).df
    assert(rows(df) == rows(plain))
  }

  test("joinBloomPrefiltered: multi-key joins and guards") {
    val big = Seq((1L, "x", 10.0), (1L, "y", 20.0), (2L, "x", 30.0))
      .toDF("k1", "k2", "v")
    val small = Seq((1L, "x", "m1"), (2L, "y", "m2")).toDF("s1", "s2", "tag")
    val plain = Chain(spark, "jb3", big)
      .join(Chain(spark, "jb4", small), "inner", Seq("k1" -> "s1", "k2" -> "s2")).df
    val bloom = Chain(spark, "jb3", big)
      .joinBloomPrefiltered(Chain(spark, "jb4", small),
        Seq("k1" -> "s1", "k2" -> "s2")).df
    assert(rows(bloom) == rows(plain))
    intercept[IllegalArgumentException] {
      Chain(spark, "jb5", big).joinBloomPrefiltered(
        Chain(spark, "jb6", small), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "jb7", big).joinBloomPrefiltered(
        Chain(spark, "jb8", small), Seq("k1" -> "s1"), expectedItems = 0L)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "jb9", big).joinBloomPrefiltered(
        Chain(spark, "jb10", small), Seq("missing" -> "s1"))
    }
  }
}
