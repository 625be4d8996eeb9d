package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Regression pins for the round-13 self-review findings: NULL-keyed
  * groups in the joined censuses, kernel null-element contracts, output
  * collision guards, reserved-name gaps, and the Bloom size clamp.
  */
class Round13ReviewSpec extends AnyFunSuite {
  import spark.implicits._

  test("mutualInformation keeps a NULL-keyed group (null-safe <=> joins, both faces)") {
    val df = Seq((Some("g1"), "x", "u"), (Some("g1"), "y", "v"),
      (None, "x", "u"), (None, "y", "u"), (None, "x", "v"))
      .toDF("g", "a", "b")
    val c = Chain(spark, "mirev", df).mutualInformation("a", "b", groupBy = Seq("g"))
    val got = c.df.collect().map(r =>
      (if (r.isNullAt(0)) "null" else r.getString(0)) -> r.getAs[Long]("n")).toMap
    assert(got == Map("g1" -> 2L, "null" -> 3L),
      s"the NULL group must survive the marginal joins, got $got")
    df.createOrReplaceTempView("mirev")
    assert(rows(spark.sql(c.sql())) == rows(c.df), "SQL face keeps it too")
  }

  test("featureRelevance keeps a NULL-keyed group") {
    val df = Seq((Some("g1"), "f1", "L1"), (None, "f2", "L2"), (None, "f1", "L1"))
      .toDF("g", "f", "label")
    val c = Chain(spark, "frrev", df)
      .featureRelevance("label", Seq("f"), groupBy = Seq("g"))
    val got = c.df.collect().map(r =>
      (if (r.isNullAt(0)) "null" else r.getString(0)) -> r.getAs[Long]("n")).toMap
    assert(got == Map("g1" -> 1L, "null" -> 2L), s"got $got")
    df.createOrReplaceTempView("frrev")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("pqEncode: a null ELEMENT throws loudly instead of reading 0.0") {
    val lattice = Chain(spark, "pqrev", SparkEntry.embFixtureDf(spark))
    val model = lattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10)
    val holed = Chain(spark, "pqrev2", Seq(
      (1L, (0 until 16).map(i => if (i == 5) null else java.lang.Float.valueOf(0.5f))))
      .toDF("vec_id", "embedding"))
    val boom = intercept[Exception] {
      holed.pqEncode(model.df, "embedding").df.collect()
    }
    assert(boom.toString.contains("null element") ||
      Option(boom.getCause).exists(_.toString.contains("null element")),
      s"must name the null element, got $boom")
  }

  test("pqFit: NaN-coordinate vectors are excluded from the training sample") {
    val base = SparkEntry.embFixtureDf(spark)
    val poisoned = Chain(spark, "pqrev3", base.union(
      Seq((99L, (0 until 16).map(i =>
        if (i == 0) Float.NaN else 1.0f))).toDF("vec_id", "embedding")))
    val model = poisoned.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 25, iters = 10)
    val cents = model.df.collect().flatMap(_.getSeq[Double](2))
    assert(cents.forall(v => !v.isNaN), "no NaN may reach a codebook centroid")
  }

  test("quantileNormalize refuses a pre-existing output column") {
    val df = Seq((1.0, 2.0)).toDF("x", "x_qnorm")
    intercept[IllegalArgumentException] {
      Chain(spark, "qnrev", df).quantileNormalize("x")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "qnrev2", df).quantileNormalizeSketch("x")
    }
  }

  test("tTestProfile: internal accumulator names refuse as group columns") {
    val df = Seq((1.0, "a")).toDF("x", "_n1")
    intercept[IllegalArgumentException] {
      Chain(spark, "ttrev", df).tTestProfile(df, "x", groupBy = Seq("_n1"))
    }
  }

  test("joinBloomPrefiltered: oversized builds lift the session clamp and restore it") {
    val key = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val before = scala.util.Try(spark.conf.get(key)).toOption
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val small = Seq((2L, "X")).toDF("sk", "tag")
    // expectedItems far past the 4M default clamp: the build must not
    // silently saturate, and the conf must come back untouched
    val bloom = Chain(spark, "blrev", big).joinBloomPrefiltered(
      Chain(spark, "blrev2", small), Seq("k" -> "sk"),
      expectedItems = 10000000L).df
    val plain = Chain(spark, "blrev", big)
      .join(Chain(spark, "blrev2", small), "inner", Seq("k" -> "sk")).df
    assert(rows(bloom) == rows(plain))
    assert(scala.util.Try(spark.conf.get(key)).toOption == before,
      "session conf must be restored after the build")
  }
}
