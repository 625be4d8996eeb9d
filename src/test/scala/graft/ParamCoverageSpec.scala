package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Parameter paths the oracle queries don't reach: alternate rank types,
  * reverse cumulative direction, median/mode/constant imputation, ntile
  * binning, null-aware one-hot, negative date offsets, non-distinct string
  * aggregation, distinct conditional counts, outer simple joins.
  */
class ParamCoverageSpec extends AnyFunSuite {
  import spark.implicits._

  test("rank: ntile buckets + qualify filter") {
    val c = table("orders").rank(
      Seq("o_totalprice" -> "DESC", "o_orderkey" -> "ASC"),
      rankType = "ntile", ntileBuckets = 4, alias = "quartile",
      qualifyFilter = Some("quartile = 1"))
    val n = table("orders").df.count()
    assert(c.df.count() == (n + 3) / 4 || c.df.count() == n / 4)
    assert(c.df.agg(max("quartile")).collect()(0).getInt(0) == 1)
  }

  test("robustScaler: global (ungrouped) form and both faces") {
    import graft.ops._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(Tuple1(_)).toDF("x")
    val c = Chain(spark, "rsg", df).robustScaler("x")
    val got = c.df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == Map(1.0 -> -1.0, 2.0 -> -0.5, 3.0 -> 0.0, 4.0 -> 0.5, 5.0 -> 1.0),
      s"got $got")
    df.createOrReplaceTempView("rsg")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("centroidByGroup: multi-key groups and a custom output name") {
    import graft.ext._
    val df = Seq(
      ("a", 1, Seq(2.0f)), ("a", 1, Seq(4.0f)), ("a", 2, Seq(10.0f)))
      .toDF("s", "k", "vec")
    val c = Chain(spark, "cmk", df).centroidByGroup(Seq("s", "k"), "vec", as = "mean_vec")
    val got = c.df.collect().map(r =>
      (r.getString(0), r.getInt(1)) -> r.getSeq[Double](2).toList).toMap
    assert(got == Map(("a", 1) -> List(3.0), ("a", 2) -> List(10.0)), s"got $got")
    df.createOrReplaceTempView("cmk")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("rolling FIRST/LAST read the frame edges") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v")
    val c = Chain(spark, "t", df).rollingAgg(
      Seq("v" -> Seq("FIRST", "LAST")), Seq("k" -> "ASC"), offsets = (-1, 0))
    val got = c.df.orderBy("k").collect()
      .map(r => (r.getAs[Double]("first_v__1_0"), r.getAs[Double]("last_v__1_0"))).toSeq
    assert(got == Seq((10.0, 10.0), (10.0, 20.0), (20.0, 30.0)), s"got $got")
    df.createOrReplaceTempView("t")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("cumulative_agg reverse direction") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v")
    val c = Chain(spark, "t", df).cumulativeAgg(
      Seq("v" -> Seq("SUM")), Seq("k" -> "ASC"), direction = "reverse")
    val got = c.df.orderBy("k").collect().map(_.getAs[Double]("sum_v_cumulative")).toSeq
    assert(got == Seq(60.0, 50.0, 30.0))
  }

  test("impute: median, mode, and constant fills") {
    val df = Seq(
      (1, Some(1.0), Some("a")), (2, None, None), (3, Some(3.0), Some("a")),
      (4, Some(10.0), Some("b")), (5, None, Some("b"))).toDF("k", "x", "s")
    val c = Chain(spark, "t", df).impute(Seq("x" -> "median", "s" -> "mode"))
    val rowsById = c.df.collect().map(r => r.getInt(0) -> r).toMap
    assert(rowsById(2).getDouble(1) == 3.0)   // median of (1,3,10)
    assert(rowsById(2).getString(2) == "a")   // mode tie a/b -> smallest
    val c2 = Chain(spark, "t", df).impute(Seq("x" -> "42.5"))
    assert(c2.df.collect().map(r => r.getInt(0) -> r).toMap.apply(2).getDouble(1) == 42.5)
  }

  test("bin: ntile variant with tiebreak") {
    val c = table("orders").bin("ntile", 4, "o_totalprice", tiebreak = Seq("o_orderkey"))
    val counts = c.df.groupBy("o_totalprice_bin").count()
      .collect().map(_.getLong(1)).toSeq
    assert(counts.max - counts.min <= 1) // ntile balance
  }

  test("flagOutliersRobust catches the corrupt value classic z-score masks") {
    // one 1e9 corruption among 1..9: it inflates sigma until its own
    // z-score (2.85) ducks under the z=3 gate — the masking failure mode.
    // The MAD statistic has a 50% breakdown point and flags it hard.
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1.0e9)).toDF("grp", "x")
    df.createOrReplaceTempView("robust_t")
    val classic = Chain(spark, "robust_t", df).flagOutliers("x", Seq("grp"), z = 3.0)
      .df.collect().map(r => r.getAs[Double]("x") -> r.getAs[Boolean]("x_outlier")).toMap
    assert(!classic(1.0e9), "classic z-score must be masked by the corruption (that's the point)")
    val robust = Chain(spark, "robust_t", df).flagOutliersRobust("x", Seq("grp"), z = 3.5)
    val got = robust.df.collect()
      .map(r => r.getAs[Double]("x") ->
        (r.getAs[Boolean]("x_outlier_robust"), r.getAs[Double]("x_mzscore"))).toMap
    assert(got(1.0e9)._1, "MAD flags the corruption")
    assert((1 to 9).forall(i => !got(i.toDouble)._1), "honest values stay unflagged")
    // med=5.5, MAD=2.5 -> M(1) = 0.6745*(1-5.5)/2.5
    assert(math.abs(got(1.0)._2 - 0.6745 * (1.0 - 5.5) / 2.5) < 1e-12)
    // the SQL face executes under Spark and matches the DataFrame face
    assert(rows(spark.sql(robust.sql())) == rows(robust.df))
    // degenerate group (single row) -> null score, false flag
    val one = Chain(spark, "t", Seq(("h", 7.0)).toDF("grp", "x"))
      .flagOutliersRobust("x", Seq("grp")).df.collect()(0)
    assert(!one.getAs[Boolean]("x_outlier_robust") && one.isNullAt(one.fieldIndex("x_mzscore")))
  }

  test("one_hot_encode emits is_null dummy for null values") {
    val df = Seq(Some("RED"), None, Some("BLUE")).toDF("color")
    val c = Chain(spark, "t", df).oneHotEncode("color")
    assert(c.df.columns.toSet.contains("color_is_null"))
    val nullRow = c.df.where(col("color").isNull).collect()(0)
    assert(nullRow.getAs[Int]("color_is_null") == 1)
    assert(nullRow.getAs[Int]("color_red") == 0)
  }

  test("dateadd with negative offset uses double-underscore name") {
    val c = table("orders").dateadd("day", "o_orderdate", -7)
    assert(c.df.columns.contains("o_orderdate_add__7_day"))
    val r = c.df.select(datediff(col("o_orderdate"), col("o_orderdate_add__7_day")))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(r == Seq(7))
  }

  test("datediff week/month/year boundary semantics") {
    val df = Seq(("2020-12-28", "2021-01-04")).toDF("a", "b")
      .select(col("a").cast("timestamp").as("a"), col("b").cast("timestamp").as("b"))
    def diff(part: String) = Chain(spark, "t", df).datediffCols(part, "a", "b")
      .df.collect()(0).getAs[Number](s"datediff_a_b").intValue()
    assert(diff("day") == 7)
    assert(diff("week") == 1)   // crosses one Monday boundary
    assert(diff("month") == 1)  // Dec -> Jan
    assert(diff("year") == 1)
  }

  test("aggregate_string non-distinct keeps duplicates, sorted") {
    val df = Seq(("g", "b"), ("g", "a"), ("g", "b")).toDF("k", "v")
    val c = Chain(spark, "t", df).aggregateString(
      Seq("v"), ",", Seq("k"), distinct = false, ordered = true)
    assert(c.df.collect()(0).getAs[String]("v_agg") == "a,b,b")
  }

  test("conditional_agg distinct count") {
    val c = table("lineitem").conditionalAgg(
      Nil, Seq("l_returnflag = 'R'"), "l_orderkey", "COUNT", distinct = true,
      alias = "r_orders")
    val direct = table("lineitem").df.where("l_returnflag = 'R'")
      .select("l_orderkey").distinct().count()
    assert(c.df.collect()(0).getAs[Long]("r_orders") == direct)
  }

  test("simple_join left keeps unmatched left rows") {
    val l = Chain(spark, "l", Seq((1, "x"), (2, "y")).toDF("k", "lv"))
    val r = Chain(spark, "r", Seq((1, "z")).toDF("k", "rv"))
    val j = l.simpleJoin(r, "left", Seq("k"))
    assert(j.df.count() == 2)
    assert(j.df.where("k = 2").collect()(0).isNullAt(2))
  }

  test("except/intersect set semantics on duplicates") {
    val a = Chain(spark, "a", Seq(1, 1, 2, 3).toDF("v"))
    val b = Chain(spark, "b", Seq(2).toDF("v"))
    assert(a.exceptRows(b).df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(a.intersectRows(b).df.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("moving_avg over multiple window sizes names each") {
    val c = table("orders").movingAvg(Seq("o_totalprice"), Seq(2, 4),
      Seq("o_orderkey" -> "ASC"))
    assert(c.df.columns.contains("mean_o_totalprice_2"))
    assert(c.df.columns.contains("mean_o_totalprice_4"))
  }

  test("datepart dow/doy/quarter variants") {
    val df = Seq("2024-02-14").toDF("d").select(col("d").cast("timestamp").as("d"))
    val c = Chain(spark, "t", df).datepart(
      Seq("d" -> "dayofweek", "d" -> "dayofyear", "d" -> "quarter"))
    val r = c.df.collect()(0)
    assert(r.getAs[Int]("d_dayofweek") == 4) // Wednesday (1=Sunday)
    assert(r.getAs[Int]("d_dayofyear") == 45)
    assert(r.getAs[Int]("d_quarter") == 1)
  }

  test("ANN / dedup / packing parameter guards fail loudly") {
    import graft.ext._
    val emb = table("embeddings")
    val q = emb.df.where("vec_id < 2")
    intercept[IllegalArgumentException] { // rerank budget below k
      emb.hammingCosineTopK(q, "vec_id", "embedding", k = 10, rerankPerQuery = 5)
    }
    intercept[IllegalArgumentException] { // band bits exceed sketch width
      emb.lshCosineTopK(q, "vec_id", "embedding", 10, planes = 64, bands = 8, rows = 10)
    }
    intercept[IllegalArgumentException] { // multiProbe beyond band width
      emb.lshCosineTopK(q, "vec_id", "embedding", 10, planes = 64, bands = 4,
        rows = 4, multiProbe = 9)
    }
    intercept[IllegalArgumentException] { // sketch width must pack into longs
      emb.df.select(graft.functions.SignSketch(col("embedding"), 100))
    }
    intercept[IllegalArgumentException] { // packing needs an order
      Chain(spark, "d", Seq((1L, 10)).toDF("id", "n"))
        .packSequences("n", 100L, orderBy = Nil)
    }
    intercept[IllegalArgumentException] { // negative rerank budget
      emb.hammingCosineTopK(q, "vec_id", "embedding", k = 0, rerankPerQuery = -1)
    }
  }

  test("incremental index / z-order parameter guards fail loudly") {
    import graft.ext._
    val docs = table("documents")
    intercept[IllegalArgumentException] { // numHashes must split into bands
      docs.minhashIndex("doc_id", "text", numHashes = 30, bands = 8)
    }
    intercept[IllegalArgumentException] { // index schema must be the minhashIndex shape
      docs.dedupAgainstIndex(docs.df, "doc_id", "text")
    }
    intercept[IllegalArgumentException] { // interleaved bits must fit a long
      Chain(spark, "t", docs.df)
        .saveZOrdered("zguard_t", Seq("doc_id", "n_chars"), bits = 40)
    }
    intercept[IllegalArgumentException] { // z columns required
      Chain(spark, "t", docs.df).saveZOrdered("zguard_t", Nil)
    }
  }
}
