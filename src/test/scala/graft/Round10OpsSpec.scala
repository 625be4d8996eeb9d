package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Round-10 operators: grouping sets, histogram, correlation matrix, skew
  * profile, weighted mean, shard, pseudonymize, count_pattern, cume_dist
  * rank. Each op's driver oracle (q_*) pins the happy path vs DuckDB; these
  * specs pin the edges the fixtures can't reach — NaN/null exclusion,
  * boundary folding, determinism, guards — and the rendered-SQL face.
  */
class Round10OpsSpec extends AnyFunSuite {
  import spark.implicits._

  // ---- grouping sets -------------------------------------------------

  test("grouping_sets equals the union of per-set aggregates; SQL face agrees") {
    val c = table("lineitem").groupingSetsAgg(
      Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq()),
      Seq("l_quantity" -> Seq("SUM")))
    val fine = table("lineitem").df.groupBy("l_returnflag", "l_linestatus").count().count()
    val mid = table("lineitem").df.select("l_returnflag").distinct().count()
    assert(c.df.count() == fine + mid + 1)
    // the () set's row: both group columns null, sum = corpus total
    val tot = c.df.where(col("l_returnflag").isNull && col("l_linestatus").isNull)
    assert(tot.count() == 1)
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  // ---- histogram -----------------------------------------------------

  test("histogram: hi folds into top bucket, null/NaN/out-of-range excluded, empty buckets present") {
    val df = Seq(Some(0.0), Some(2.5), Some(10.0), Some(10.0), Some(-1.0),
      Some(11.0), Some(Double.NaN), None).map(Tuple1(_)).toDF("x")
    val c = Chain(spark, "hx", df).histogram("x", 0.0, 10.0, 4)
    val got = c.df.orderBy("bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toList
    // 0.0 -> b0; 2.5 -> b1 (floor(2.5/2.5)=1); 10.0 twice -> folds to b3;
    // -1.0, 11.0, NaN, null excluded; b2 empty but present
    assert(got == List(0L -> 1L, 1L -> 1L, 2L -> 0L, 3L -> 2L), s"got $got")
    val edges = c.df.orderBy("bucket").collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toList
    assert(edges == List((0.0, 2.5), (2.5, 5.0), (5.0, 7.5), (7.5, 10.0)))
    df.createOrReplaceTempView("hx")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("histogram grouped: per-group spine carries empty buckets; SQL face agrees") {
    val df = Seq(("a", 1.0), ("a", 9.0), ("b", 1.0)).toDF("g", "x")
    val c = Chain(spark, "hg", df).histogram("x", 0.0, 10.0, 2, groupBy = Seq("g"))
    assert(c.df.count() == 4) // 2 groups x 2 buckets
    val b = c.df.where(col("g") === "b" && col("bucket") === 1L).collect()
    assert(b.length == 1 && b(0).getAs[Long]("cnt") == 0L)
    df.createOrReplaceTempView("hg")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  // ---- corr matrix ---------------------------------------------------

  test("corr_matrix: exact ±1 on linear columns, per-pair NaN exclusion; SQL face agrees") {
    val df = Seq(
      (1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, Double.NaN)).toDF("a", "b", "c")
    val c = Chain(spark, "cm", df).corrMatrix(Seq("a", "b", "c"))
    val got = c.df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(math.abs(got(("a", "b"))._1 - 1.0) < 1e-12)
    assert(got(("a", "b"))._2 == 4) // NaN only hits pairs involving c
    assert(math.abs(got(("a", "c"))._1 + 1.0) < 1e-12)
    assert(got(("a", "c"))._2 == 3) // the NaN row dropped for this pair
    assert(math.abs(got(("b", "c"))._1 + 1.0) < 1e-12)
    df.createOrReplaceTempView("cm")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("corr_matrix listwise: NaN drops the row from EVERY pair; equals pairwise on clean data") {
    val dirty = Seq(
      (1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, Double.NaN)).toDF("a", "b", "c")
    val lw = Chain(spark, "cml", dirty).corrMatrix(Seq("a", "b", "c"), deletion = "listwise")
    val got = lw.df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // row 4 leaves every pair — n = 3 even for (a, b), unlike pairwise's 4
    assert(got.values.forall(_._2 == 3L), s"got $got")
    assert(math.abs(got(("a", "b"))._1 - 1.0) < 1e-12)
    dirty.createOrReplaceTempView("cml")
    assert(rows(spark.sql(lw.sql())) == rows(lw.df))
    val clean = Seq((1.0, 2.0), (2.0, 5.0), (3.0, 6.0)).toDF("a", "b")
    val p = Chain(spark, "cmc", clean).corrMatrix(Seq("a", "b")).df
    val l = Chain(spark, "cmc", clean).corrMatrix(Seq("a", "b"), deletion = "listwise").df
    assert(rows(p) == rows(l), "regimes agree when nothing is missing")
    assertThrows[IllegalArgumentException](
      Chain(spark, "cmc", clean).corrMatrix(Seq("a", "b"), deletion = "nope"))
  }

  test("corr_matrix grouped emits one row per (group, pair)") {
    val df = Seq(("g1", 1.0, 1.0), ("g1", 2.0, 2.0), ("g2", 1.0, 2.0), ("g2", 2.0, 1.0))
      .toDF("g", "a", "b")
    val c = Chain(spark, "cmg", df).corrMatrix(Seq("a", "b"), groupBy = Seq("g"))
    val got = c.df.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(got("g1") - 1.0) < 1e-12 && math.abs(got("g2") + 1.0) < 1e-12)
    df.createOrReplaceTempView("cmg")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  // ---- skew profile --------------------------------------------------

  test("skew_profile: heaviest keys first, exact share, deterministic ties; SQL face agrees") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm2") ++ Seq.fill(3)("warm1") ++ Seq("cold"))
      .map(Tuple1(_)).toDF("k")
    val c = Chain(spark, "sp", df).skewProfile(Seq("k"), topK = 3)
    val got = c.df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    // ties (warm1/warm2 both 3) break by key ascending
    assert(got == List(("hot", 6L, 6.0 / 13), ("warm1", 3L, 3.0 / 13), ("warm2", 3L, 3.0 / 13)),
      s"got $got")
    df.createOrReplaceTempView("sp")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  // ---- weighted agg --------------------------------------------------

  test("weighted_agg: exact Σwx/Σw, rows with NaN/null on either side excluded whole") {
    val df = Seq(
      ("a", Some(10.0), Some(1.0)), ("a", Some(20.0), Some(3.0)),
      ("a", Some(Double.NaN), Some(5.0)), ("a", Some(99.0), None),
      ("b", Some(7.0), Some(2.0))).toDF("g", "x", "w")
    val c = Chain(spark, "wa", df).weightedAgg(Seq("g"), "x", "w")
    val got = c.df.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(got("a") == ((10.0 * 1 + 20.0 * 3) / 4.0, 4.0, 2L), s"got $got")
    assert(got("b") == ((7.0, 2.0, 1L)))
    df.createOrReplaceTempView("wa")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  // ---- shard ---------------------------------------------------------

  test("shard: stable pure function of the key, in range, balanced-ish; SQL face agrees") {
    val c = table("documents").shard(8, Seq("doc_id"))
    val vals = c.df.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals.keySet.forall(s => s >= 0 && s < 8))
    // md5 spreads: with 60 docs every shard should land well under half
    assert(vals.values.max < c.df.count() / 2)
    // pure function of the key: re-evaluation produces identical assignment
    val again = table("documents").shard(8, Seq("doc_id"))
    assert(rows(again.df) == rows(c.df))
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("shard matches an independent md5-prefix computation") {
    val df = Seq("alpha", "beta", "gamma").map(Tuple1(_)).toDF("id")
    val c = Chain(spark, "sh", df).shard(16, Seq("id"))
    val got = c.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = Seq("alpha", "beta", "gamma").map { s =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      s -> java.lang.Long.parseLong(h, 16) % 16
    }.toMap
    assert(got == exp, s"got $got expected $exp")
  }

  // ---- pseudonymize --------------------------------------------------

  test("pseudonymize: equal values get equal tokens, nulls stay null, salts differ") {
    val df = Seq(Some("alice"), Some("alice"), Some("bob"), None).map(Tuple1(_)).toDF("name")
    val c = Chain(spark, "pz", df).pseudonymize(Seq("name"), "s1")
    val toks = c.df.collect().map(r => Option(r.getString(0))).toList
    assert(toks.count(_.isEmpty) == 1)
    val defined = toks.flatten
    assert(defined.count(_ == defined.head) == 2)          // alice twice, same token
    assert(defined.distinct.size == 2)                     // alice != bob
    assert(defined.forall(t => t.length == 16 && t.matches("[0-9a-f]+")))
    val c2 = Chain(spark, "pz", df).pseudonymize(Seq("name"), "s2")
    assert(rows(c2.df) != rows(c.df))                      // salt rotation breaks linkage
    df.createOrReplaceTempView("pz")
    // the default render carries a {{salt}} placeholder (Round11Spec pins
    // it); the executable round-trip needs the opt-in literal face
    val cLit = Chain(spark, "pz", df).pseudonymize(Seq("name"), "s1", saltInRender = true)
    assert(rows(spark.sql(cLit.sql())) == rows(c.df))
  }

  test("pseudonymize guards: missing column and quoted salt refuse loudly") {
    val df = Seq("x").map(Tuple1(_)).toDF("a")
    val ch = Chain(spark, "pg", df)
    assertThrows[IllegalArgumentException](ch.pseudonymize(Seq("nope"), "s"))
    assertThrows[IllegalArgumentException](ch.pseudonymize(Seq("a"), "it's"))
  }

  // ---- count_pattern -------------------------------------------------

  test("count_pattern: non-overlapping counts, null text -> null counts; SQL face agrees") {
    val df = Seq(Some("a1 b22 c333"), Some("no digits"), None).map(Tuple1(_)).toDF("t")
    val c = Chain(spark, "cp", df).countPattern("t",
      Seq("digits" -> "[0-9]+", "words" -> "[a-z]+"))
    val got = c.df.collect().map(r =>
      Option(r.getString(0)) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(Some("a1 b22 c333")) == ((Some(3L), Some(3L))))
    assert(got(Some("no digits")) == ((Some(0L), Some(2L))))
    assert(got(None) == ((None, None)))
    assertThrows[IllegalArgumentException](
      Chain(spark, "cp", df).countPattern("t", Seq("x" -> "a", "x" -> "b")))
    df.createOrReplaceTempView("cp")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  // ---- cume_dist rank ------------------------------------------------

  test("rank cume_dist is the <=-rank share within the partition") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 4.0)).toDF("p", "v")
    val c = Chain(spark, "cd", df).rank(Seq("v" -> "ASC"), Seq("p"), "cume_dist", "cd")
    val got = c.df.collect().map(r => (r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set((1.0, 0.25), (2.0, 0.75), (4.0, 1.0)), s"got $got")
    df.createOrReplaceTempView("cd")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }
}
