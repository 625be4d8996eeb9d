package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import TestSpark._

/** The SQL face of the custom kernels: GraftFunctions.register makes
  * every codegen Expression / sketch aggregate callable from spark.sql,
  * and the SQL path must produce exactly what the column path produces.
  */
class FunctionsSqlSpec extends AnyFunSuite {
  import spark.implicits._

  // registration goes through the session entry point (embedded path)
  GraftSession(spark)

  test("scalar kernels: SQL call equals the column face bit-for-bit") {
    val docs = Seq(
      (1L, "Café  au\tlait et un croissant s'il vous plaît"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "plain ascii text stays put here")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("fx_docs")

    val viaSql = spark.sql(
      """SELECT doc_id,
        |  unicode_normalize(text, 'NFC') AS norm,
        |  rolling_fingerprint(text, 8) AS rfp,
        |  shingle_hashes(split(lower(trim(text)), '\\s+'), 2) AS sh,
        |  simhash64(split(lower(trim(text)), '\\s+')) AS sim
        |FROM fx_docs""".stripMargin)
    val viaCols = docs.select(col("doc_id"),
      org.apache.spark.sql.GraftBridge.column(graft.functions.UnicodeNormalize(
        org.apache.spark.sql.GraftBridge.expression(col("text")), "NFC")).as("norm"),
      org.apache.spark.sql.GraftBridge.column(graft.functions.RollingFingerprint(
        org.apache.spark.sql.GraftBridge.expression(col("text")), 8)).as("rfp"),
      graft.functions.ShingleHashes(split(lower(trim(col("text"))), "\\s+"), 2).as("sh"),
      graft.functions.Sketches.simhash64(split(lower(trim(col("text"))), "\\s+")).as("sim"))
    assert(rows(viaSql) == rows(viaCols))
  }

  test("sketch aggregates work under SQL GROUP BY and match the column face") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.createOrReplaceTempView("fx_li")
    val viaSql = spark.sql(
      """SELECT l_returnflag,
        |  kll_quantile(kll_merge_agg(qs), 0.5d) AS p50,
        |  freq_topk(freq_merge_agg(fs), 2) AS top2
        |FROM (
        |  SELECT l_returnflag, l_linestatus,
        |    kll_sketch_agg(CAST(l_extendedprice AS DOUBLE), 200) AS qs,
        |    freq_sketch_agg(CAST(l_linenumber AS STRING), 64) AS fs
        |  FROM fx_li GROUP BY 1, 2)
        |GROUP BY 1""".stripMargin)
    val viaCols = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        graft.functions.KllSketches.sketchAgg(col("l_extendedprice").cast("double"), 200).as("qs"),
        graft.functions.FreqSketches.sketchAgg(col("l_linenumber").cast("string"), 64).as("fs"))
      .groupBy("l_returnflag")
      .agg(
        graft.functions.KllSketches.quantile(
          graft.functions.KllSketches.mergeAgg(col("qs")), 0.5).as("p50"),
        graft.functions.FreqSketches.topK(
          graft.functions.FreqSketches.mergeAgg(col("fs")), 2).as("top2"))
    // frequent-items tops are deterministic; KLL p50 compares exactly only
    // because both paths aggregate the same input through the same plan
    // shape — compare the deterministic columns, bound the KLL ones
    val s = viaSql.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0)))).toMap
    val c = viaCols.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0)))).toMap
    assert(s.keySet == c.keySet)
    s.foreach { case (k, (p50, top2)) =>
      assert(top2 == c(k)._2, s"$k top-2 items differ: $top2 vs ${c(k)._2}")
      assert(math.abs(p50 - c(k)._1) / math.max(c(k)._1, 1e-9) < 0.05,
        s"$k p50 differs beyond KLL tolerance: $p50 vs ${c(k)._1}")
    }
  }

  test("shape parameters must be literals, with a loud error otherwise") {
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', lower('NFC'))").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.contains("form"),
      s"unexpected error: ${e.getMessage.take(200)}")
  }

  test("every registered kernel resolves by name in SQL") {
    // future kernels must land in the registry: resolution is checked for
    // ALL builders, not just the ones with dedicated tests above
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val missing = graft.functions.GraftFunctions.registeredNames.filterNot(n =>
      spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(n)))
    assert(missing.isEmpty, s"unregistered kernels: ${missing.mkString(", ")}")
    assert(graft.functions.GraftFunctions.registeredNames.size >= 19)
  }

  test("GraftExtensions applies cleanly to a fresh extensions bag") {
    // a second SparkSession in one JVM would just return the shared one
    // (configs ignored), so the config path can't be driven end-to-end in
    // this suite; both entry points share the same builder list, which the
    // register() tests above execute — here we pin that the injector
    // accepts every builder without conflict
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
