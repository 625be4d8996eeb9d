package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for the round-13 sixth batch: the ℓ-diversity privacy audit and
  * the Jensen–Shannon corpus-mix divergence.
  */
class Round13Batch6Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- lDiversityViolations ---------------------------------------------

  test("lDiversity: distinct counting, the null-sensitive bump, and the HAVING cut") {
    val df = Seq(
      // class A: 3 rows, sensitive {x, y} → 2 distinct, violates l=3
      ("A", Some("x")), ("A", Some("y")), ("A", Some("x")),
      // class B: {x, y, null} → 2 distinct + null bump = 3, passes l=3
      ("B", Some("x")), ("B", Some("y")), ("B", None),
      // class C: {null} alone → 0 + 1 = 1, violates
      ("C", None)).toDF("quasi", "s")
    val c = Chain(spark, "ld1", df).lDiversityViolations(Seq("quasi"), "s", l = 3)
    val got = c.df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("A" -> ((3L, 2L)), "C" -> ((1L, 1L))),
      s"A and C violate, B's null counts as a third value; got $got")
    df.createOrReplaceTempView("ld1")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("lDiversity: guards refuse misuse") {
    val df = Seq(("a", "s")).toDF("q", "s")
    val c = Chain(spark, "ld2", df)
    intercept[IllegalArgumentException] {
      c.lDiversityViolations(Seq("q", "s"), "s", l = 3)
    }
    intercept[IllegalArgumentException] {
      c.lDiversityViolations(Seq("q"), "s", l = 1)
    }
    intercept[IllegalArgumentException] {
      c.lDiversityViolations(Seq("q"), "missing", l = 2)
    }
  }

  // ---- tClosenessViolations ---------------------------------------------

  test("tCloseness: skewed classes violate, a globally-mixed class does not; SQL face agrees") {
    // A pure-x, B pure-y, C balanced; global is 50/50 → TVD(A)=TVD(B)=0.5,
    // TVD(C)=0 exactly under the class-present fold
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "y"), ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "y")).toDF("quasi", "s")
    val c = Chain(spark, "tc1", df).tClosenessViolations(Seq("quasi"), "s",
      tFp = 400000L)
    val got = c.df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("A", "B"), s"C is globally mixed, got $got")
    assert(got("A")._2 == 500000L && got("B")._2 == 500000L,
      s"pure classes sit at exactly TVD 0.5, got $got")
    df.createOrReplaceTempView("tc1")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    // at t = 0.6 nothing violates
    assert(Chain(spark, "tc1b", df)
      .tClosenessViolations(Seq("quasi"), "s", tFp = 600000L).df.count() == 0L)
  }

  test("tCloseness: null sensitive is a value; guards refuse misuse") {
    val df = Seq(("A", Some("x")), ("A", None), ("B", Some("x")), ("B", Some("x")))
      .toDF("quasi", "s")
    // global: x 3/4, null 1/4. A: x ½, null ½ → TVD = ¼; B: pure x → TVD = ¼
    val got = Chain(spark, "tc2", df)
      .tClosenessViolations(Seq("quasi"), "s", tFp = 200000L)
      .df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("A" -> 250000L, "B" -> 250000L),
      s"null-skew must be measured, got $got")
    intercept[IllegalArgumentException] {
      Chain(spark, "tc3", df).tClosenessViolations(Seq("quasi", "s"), "s")
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "tc4", df).tClosenessViolations(Seq("quasi"), "s", tFp = 0L)
    }
    intercept[IllegalArgumentException] {
      Chain(spark, "tc5", df.withColumnRenamed("quasi", "tvd_fp"))
        .tClosenessViolations(Seq("tvd_fp"), "s")
    }
  }

  // ---- jsdProfile -------------------------------------------------------

  test("jsdProfile: identical mixes give exactly 0, disjoint supports give ~ln2") {
    val a = Seq("x", "x", "y", "z").toDF("v")
    val same = Chain(spark, "js1", a).jsdProfile(a, "v").df.collect()(0)
    assert(same.getAs[Double]("jsd") == 0.0,
      s"identical distributions: exactly 0, got $same")
    assert(same.getAs[Long]("n_base") == 4L && same.getAs[Long]("n_values") == 3L)
    val disjoint = Chain(spark, "js2", Seq("a", "b").toDF("v"))
      .jsdProfile(Seq("c", "d").toDF("v"), "v").df.collect()(0)
    assert(math.abs(disjoint.getAs[Double]("jsd") - math.log(2.0)) < 1e-5,
      s"disjoint supports: ~ln2, got ${disjoint.getAs[Double]("jsd")}")
  }

  test("jsdProfile: an empty side reports n 0 with NULL entropies and jsd") {
    val base = Seq(Some("x"), None).toDF("v")
    val other = Seq(Option.empty[String]).toDF("v")
    val got = Chain(spark, "js3", base).jsdProfile(other, "v").df.collect()(0)
    assert(got.getAs[Long]("n_base") == 1L && got.getAs[Long]("n_other") == 0L)
    assert(!got.isNullAt(got.fieldIndex("h_base")))
    assert(got.isNullAt(got.fieldIndex("h_other")) &&
      got.isNullAt(got.fieldIndex("h_mix")) &&
      got.isNullAt(got.fieldIndex("jsd")),
      "no other-side distribution: NULLs, never fake zeros")
  }

  test("quantileNormalize SQL face: an all-null group survives the ANSI zero-division guard") {
    val df = Seq((Some(1.0), "a"), (Some(2.0), "a"),
      (Option.empty[Double], "b"), (Option.empty[Double], "b")).toDF("x", "g")
    val c = Chain(spark, "qnz", df).quantileNormalize("x", Seq("g"))
    df.createOrReplaceTempView("qnz")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
    assert(c.df.where("g = 'b'").collect().forall(_.isNullAt(2)),
      "all-null group rows normalize to NULL on both faces")
  }

  test("jsdProfile grouped: equals the per-segment ungrouped runs") {
    val docs = table("documents")
    val base = docs.filterRows(Seq("doc_id % 2 = 0"))
    val other = docs.df.where("doc_id % 2 = 1")
    val grouped = base.jsdProfile(other, "source", groupBy = Seq("lang"))
      .df.collect().map(r => r.getString(0) -> r.getAs[Double]("jsd")).toMap
    grouped.keys.foreach { lg =>
      val single = base.filterRows(Seq(s"lang = '$lg'"))
        .jsdProfile(other.where(s"lang = '$lg'"), "source").df.collect()(0)
      assert(single.getAs[Double]("jsd") == grouped(lg), s"lang $lg")
    }
    intercept[IllegalArgumentException] {
      base.jsdProfile(other, "source", groupBy = Seq("jsd"))
    }
    intercept[IllegalArgumentException] {
      base.jsdProfile(other.drop("source"), "source")
    }
  }
}
