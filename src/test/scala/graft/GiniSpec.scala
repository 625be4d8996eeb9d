package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for giniConcentration: the corpus-concentration census. */
class GiniSpec extends AnyFunSuite {
  import spark.implicits._

  test("gini: balanced 0, 90/10 = 0.4 exactly, single category 0, null counted") {
    val balanced = Seq("a", "a", "b", "b").toDF("v")
    assert(Chain(spark, "gi1", balanced).giniConcentration("v")
      .df.collect()(0).getAs[Double]("gini") == 0.0)
    val skewed = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("v")
    val r = Chain(spark, "gi2", skewed).giniConcentration("v").df.collect()(0)
    assert(r.getAs[Double]("gini") == 0.4 && r.getAs[Long]("n_values") == 2L,
      s"(2*(10+180) - 3*100)/(2*100) = 0.4, got $r")
    val single = Seq("only", "only").toDF("v")
    assert(Chain(spark, "gi3", single).giniConcentration("v")
      .df.collect()(0).getAs[Double]("gini") == 0.0)
    val withNull = Seq(Some("a"), None, None, None).toDF("v")
    val rn = Chain(spark, "gi4", withNull).giniConcentration("v").df.collect()(0)
    assert(rn.getAs[Long]("n_values") == 2L && rn.getAs[Double]("gini") == 0.25,
      s"null is a category: (2*(1+6) - 3*4)/(2*4) = 0.25, got $rn")
  }

  test("gini grouped: equals per-segment; guards refuse misuse") {
    val docs = table("documents")
    val grouped = docs.giniConcentration("source", groupBy = Seq("lang"))
      .df.collect().map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    grouped.keys.foreach { lg =>
      val single = docs.filterRows(Seq(s"lang = '$lg'"))
        .giniConcentration("source").df.collect()(0)
      assert(single.getAs[Double]("gini") == grouped(lg), s"lang $lg")
    }
    intercept[IllegalArgumentException] {
      docs.giniConcentration("source", groupBy = Seq("source"))
    }
    intercept[IllegalArgumentException] { docs.giniConcentration("missing") }
  }
}
