package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Chain, Exact}
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-18 OPTIMIZATION batch — each change must keep
  * results bit-identical while cutting plan cost, so every test pins
  * value-equality between the old and new formulations plus the plan
  * shape the optimization claims.
  */
class Round18Spec extends AnyFunSuite {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ---- Exact.splitDecimalSum8 ≡ SUM(CAST(x AS DECIMAL(38,8))) ---------

  /** bitwise double equality (NaN-safe) — value "equality" would paper
    * over sign-of-zero or last-bit differences the oracle hash sees
    */
  private def bitEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y)
    case (x, y) => x == y
  }

  private def checkSplitEq(values: Seq[java.lang.Double]): Unit = {
    val df = values.toDF("x")
    val bound = values.filter(v => v != null && !v.isNaN && !v.isInfinite)
      .map(v => math.abs(v.doubleValue)).foldLeft(0.0)(math.max)
    assert(Exact.splitSumSafe(bound, values.size),
      s"fixture must satisfy the probe: bound=$bound n=${values.size}")
    val got = df.agg(
      Exact.splitDecimalSum8(col("x")).as("split"),
      Exact.splitDecimalSum8(col("x"), fastCast = true).as("fast"),
      sum(col("x").cast(DecimalType(38, 8))).cast("double").as("dec")).head()
    assert(bitEq(got.get(0), got.get(2)),
      s"split=${got.get(0)} dec=${got.get(2)} for $values")
    assert(bitEq(got.get(1), got.get(2)),
      s"fastCast=${got.get(1)} dec=${got.get(2)} for $values")
  }

  test("splitDecimalSum8: bit-identical to the decimal sum on adversarial values") {
    // exact half-boundaries at the 9th decimal (HALF_UP territory), signs,
    // shortest-repr classics (0.1), large magnitudes near the sf bench
    // ranges, exact integers, nulls
    checkSplitEq(Seq[java.lang.Double](1.5e-8, 2.5e-8, -3.5e-8, 5e-9, -5e-9,
      0.1, -0.1, 0.30000000000000004, 1.0 / 3.0, -1.0 / 3.0,
      104999.91, -104999.91, 1.1022481097e10, 0.0, -0.0, null,
      12345678.87654321, -12345678.87654321, 1e-300, -1e-300,
      49.999999995, -49.999999995, 7.000000005, 2.000000015,
      // totals whose 8th decimal digit is live (pins the recombination's
      // result scale: a decimal(38,7) add would round these)
      1e-8, 3e-8, -7e-8, 1.1e-7, -2.30000007e-7))
    // all-null and empty frames: both paths must return null
    val allNull = Seq[java.lang.Double](null, null).toDF("x").agg(
      Exact.splitDecimalSum8(col("x")).as("s"),
      sum(col("x").cast(DecimalType(38, 8))).cast("double").as("d")).head()
    assert(allNull.isNullAt(0) && allNull.isNullAt(1))
  }

  test("splitDecimalSum8: randomized sweep across magnitudes matches bitwise") {
    val rng = new scala.util.Random(1801)
    for (mag <- Seq(1e-6, 1.0, 50.0, 1e5, 1e9, 4e10)) {
      val vals: Seq[java.lang.Double] = (0 until 2000).map { i =>
        if (i % 97 == 0) null
        else java.lang.Double.valueOf((rng.nextDouble() - 0.5) * mag)
      }
      val bound = mag
      if (Exact.splitSumSafe(bound, vals.size)) checkSplitEq(vals)
    }
  }

  test("Dec8Unscaled.unscaled8: exhaustive fuzz against the BigDecimal cast arithmetic") {
    def ref(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(8, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    def check(x: Double): Unit = {
      val got = graft.functions.Dec8Unscaled.unscaled8(x)
      val want = ref(x)
      assert(got == want, s"unscaled8($x) = $got, BigDecimal says $want " +
        s"(bits ${java.lang.Double.doubleToRawLongBits(x)})")
    }
    // exact decimal half-boundaries k + 0.5 at the 9th digit — the HALF_UP
    // corner the fast path must decline or get right — across magnitudes
    for (k <- -2000L to 2000L) {
      check((2 * k + 1) / 2e8)            // nearest double to (k+0.5)·1e-8
      check(k / 1e8)                      // exact grid points
      check(k / 1e8 + 1e-16); check(k / 1e8 - 1e-16)
    }
    // neighbors of half-integer unscaled boundaries at large magnitudes
    // (ulp-sized steps; domain capped where the unscaled value fits a
    // long — the splitSumSafe probe the callers must pass)
    for (m <- Seq(1e3, 1e6, 1e9, 1e12, 1e15, 1e17, 4e17); s <- Seq(-1, 1)) {
      val b = s * (math.rint(m) + 0.5) / 1e8
      check(b); check(math.nextUp(b)); check(math.nextDown(b))
    }
    // dense random sweep across magnitudes and signs within the probed
    // domain (|x| < ~4.6e10 so round(x·1e8) fits a long)
    val rng = new scala.util.Random(1803)
    for (_ <- 0 until 2000000) {
      val mag = math.pow(10, rng.nextDouble() * 22 - 12) // 1e-12 .. 1e10
      check((rng.nextDouble() - 0.5) * mag)
    }
    // raw random bit patterns in the finite, in-range domain
    for (_ <- 0 until 2000000) {
      val x = java.lang.Double.longBitsToDouble(rng.nextLong())
      if (!x.isNaN && !x.isInfinite && math.abs(x) < 4.0e10) check(x)
    }
    check(0.0); check(-0.0); check(1e-300); check(-1e-300)
  }

  test("splitSumSafe: bounds, NaN/Inf and corpus-scale n close the gate") {
    assert(Exact.splitSumSafe(104999.91 * 104999.91, 600000L)) // the bench worst case
    assert(!Exact.splitSumSafe(Double.NaN, 100L))
    assert(!Exact.splitSumSafe(Double.PositiveInfinity, 100L))
    assert(!Exact.splitSumSafe(1.0, 1L << 31))   // n >= 2^30: corpus scale
    assert(!Exact.splitSumSafe(1e12, 1000L))     // per-row unscaled past 2^61/1e8
    assert(Exact.splitSumSafe(0.0, 0L))          // empty frame is trivially safe
  }

  // ---- corrMatrix: probed split path ≡ forced pre-round-18 paths ------

  private def corrFixture(withNulls: Boolean): DataFrame = {
    val rng = new scala.util.Random(1802)
    (0 until 4000).map { i =>
      def v(mag: Double): java.lang.Double =
        if (withNulls && rng.nextInt(13) == 0) null
        else if (withNulls && rng.nextInt(29) == 0) java.lang.Double.valueOf(Double.NaN)
        else java.lang.Double.valueOf((rng.nextDouble() - 0.5) * mag)
      (i % 7, v(100.0), v(1e5), v(0.2))
    }.toDF("g", "a", "b", "c")
  }

  private def corrBoth(df: DataFrame, groupBy: Seq[String], deletion: String): Unit = {
    val probed = Chain(spark, "t", df).corrMatrix(Seq("a", "b", "c"), groupBy, deletion).df
    spark.conf.set("spark.graft.corr.probeMaxBytes", "0")
    val plain =
      try Chain(spark, "t", df).corrMatrix(Seq("a", "b", "c"), groupBy, deletion).df
      finally spark.conf.unset("spark.graft.corr.probeMaxBytes")
    assert(rows(probed) == rows(plain),
      s"groupBy=$groupBy deletion=$deletion diverged")
  }

  test("corrMatrix: split-long path equals the decimal path on every branch") {
    for (withNulls <- Seq(false, true);
         groupBy <- Seq(Nil, Seq("g"));
         deletion <- Seq("pairwise", "listwise"))
      corrBoth(corrFixture(withNulls), groupBy, deletion)
  }

  test("corrMatrix: values containing Inf keep exact results (split gate declines)") {
    val df = Seq[(Int, java.lang.Double, java.lang.Double, java.lang.Double)](
      (0, 1.0, 2.0, 3.0), (1, Double.PositiveInfinity, 4.0, 5.0),
      (2, 2.5, 6.5, 0.25), (3, -7.5, 1.25, 0.125)
    ).toDF("g", "a", "b", "c")
    // Inf makes max|a| infinite -> every a-touching sum declines the split
    // path; results must still match the forced-decimal shape exactly
    corrBoth(df, Nil, "listwise")
  }

  test("corrMatrix: the declared-listwise plan carries split-long partial aggregates") {
    val df = corrFixture(withNulls = false)
    val ch = Chain(spark, "t", df).corrMatrix(Seq("a", "b", "c"), deletion = "listwise")
    val plan = ch.df.queryExecution.executedPlan.toString
    assert(plan.contains("shiftright"),
      s"expected split-long (shiftright) partial aggregates in:\n$plan")
  }

  // ---- joinCardinalityProfile: checkpointed keys-grain profile --------

  test("joinCardinalityProfile: checkpoint rides the result plan and releases") {
    val l = Seq(1, 1, 1, 2, 3).map(k => (k, s"l$k")).toDF("k", "lv")
    val r = Seq(1, 2, 2, 4).map(k => (k, s"r$k")).toDF("k", "rv")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val prof = Chain(spark, "l", l)
      .joinCardinalityProfile(Chain(spark, "r", r), Seq("k" -> "k"), topK = 2)
    // the keys-grain checkpoint is a declared materialization (track the
    // specific new RDD ids — other suites may persist concurrently)
    val newIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(newIds.nonEmpty,
      "expected the keys-grain profile frame to be checkpointed")
    val got = prof.df.collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getLong(2)))
    // hottest matched key: k=1 (3x1), then k=2 (1x2)
    assert(got.toSeq == Seq((1, 3L, 1L), (2, 1L, 2L)), got.toSeq.toString)
    val full = prof.df.head()
    assert(full.getAs[Long]("rows_a") == 5L && full.getAs[Long]("rows_b") == 4L)
    assert(full.getAs[Long]("keys_a") == 3L && full.getAs[Long]("keys_b") == 3L)
    assert(full.getAs[Long]("keys_matched") == 2L)
    assert(full.getAs[Double]("est_rows") == 5.0) // 3*1 + 1*2
    // release contract: the blocks ride the result plan
    Chain.releaseCheckpoints(prof.df)
    assert(spark.sparkContext.getPersistentRDDs.keySet.intersect(newIds).isEmpty,
      "releaseCheckpoints must free the profile checkpoint")
  }

  // ---- dedupNearEmbedding: contraction default ≡ propagation ----------

  test("dedupNearEmbedding: contraction default equals propagation on a deep chain") {
    // embeddings forming one long similarity CHAIN (each vector close to
    // its neighbor, far from the rest): v_i = unit(cos(i*step), sin(i*step))
    // — consecutive cosines ≈ cos(0.35) = 0.939 pass the 0.9 threshold,
    // two-apart cos(0.7) = 0.765 fails; the adversarial diameter shape
    // the contraction default exists for, plus isolated singletons
    val step = 0.35
    val chain = (0 until 24).map { i =>
      (i.toLong, Seq(math.cos(i * step), math.sin(i * step)), s"d$i")
    }
    val iso = Seq((100L, Seq(0.0, -1.0), "iso1"), (101L, Seq(-1.0, 0.0), "iso2"))
    val df = (chain ++ iso).toDF("vec_id", "embedding", "meta")
    def run(clu: String) = rows(Chain(spark, "e", df)
      .dedupNearEmbedding("vec_id", "embedding", 0.9, clusterer = clu).df)
    val contraction = run("contraction")
    val propagation = run("propagation")
    assert(contraction == propagation,
      s"contraction=$contraction\npropagation=$propagation")
    // the default STAYS propagation (the contraction default was measured
    // and regressed — see dedupNearEmbedding's docstring)
    assert(rows(Chain(spark, "e", df)
      .dedupNearEmbedding("vec_id", "embedding", 0.9).df) == propagation)
  }

  test("clusterPairs: an empty pair frame returns empty labels (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Chain(spark, "p", empty).clusterPairs().df
    assert(got.isEmpty)
    assert(got.columns.toSeq == Seq("id", "cluster_id"))
    Chain.releaseCheckpoints(got)
  }

  // ---- CheckpointProbe: bounded wait + pinned fallback path -----------

  test("CheckpointProbe: forced fallback recomputes identical metrics") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val (cp1, m1) = graft.core.CheckpointProbe(df,
      "_s" -> sum(col("v").cast("decimal(38,0)")), "_n" -> count(lit(1)))
    spark.conf.set("spark.graft.checkpointProbe.forceFallback", "true")
    val (cp2, m2) =
      try graft.core.CheckpointProbe(df,
        "_s" -> sum(col("v").cast("decimal(38,0)")), "_n" -> count(lit(1)))
      finally spark.conf.unset("spark.graft.checkpointProbe.forceFallback")
    assert(m1(1) == 4L && m2(1) == 4L)
    assert(m1(0).asInstanceOf[java.math.BigDecimal].compareTo(
      m2(0).asInstanceOf[java.math.BigDecimal]) == 0)
    assert(rows(cp1) == rows(cp2))
    Chain.releaseCheckpoints(cp1); Chain.releaseCheckpoints(cp2)
  }

  // ---- PrefixScan: reliable-checkpoint opt-in --------------------------

  test("PrefixScan: reliable opt-in checkpoints durably with identical sums") {
    val df = (1 to 500).map(i => (i % 5, (i % 17).toLong, i)).toDF("g", "w", "i")
    def scan() = graft.core.PrefixScan.exclusivePrefixSum(
      df, Seq(col("g")), Seq(col("i")), col("w"), "_cum")
    val plain = rows(scan())
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set("spark.graft.prefixScan.reliable", "true")
    val rel =
      try scan()
      finally spark.conf.unset("spark.graft.prefixScan.reliable")
    assert(rows(rel) == plain, "reliable checkpoint changed the sums")
    // the sorted frame actually checkpointed into the directory
    val files = java.nio.file.Files.walk(dir).filter(
      java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, s"expected reliable checkpoint files under $dir")
  }

  // ---- maybeBroadcastSmall: byte-aware cap -----------------------------

  test("broadcastFits: string-keyed frames hit the byte cap before the row cap") {
    import org.apache.spark.sql.types._
    val longKeyed = StructType(Seq(StructField("id", LongType),
      StructField("cluster_id", LongType)))
    val stringKeyed = StructType(Seq(StructField("node", StringType),
      StructField("rank", LongType)))
    val mb64 = 64L << 20
    // (long, long) at the 1M row cap: 16 B/row = 16 MB -> fits
    assert(ext.DedupOps.broadcastFits(longKeyed, 1000000L, mb64, 48L))
    // string-keyed at 1M rows: 56 B/row = 56 MB -> still fits 64 MB
    assert(ext.DedupOps.broadcastFits(stringKeyed, 1000000L, mb64, 48L))
    // ... but past ~1.2M string rows the byte cap closes the gate even
    // though a row-only cap of 2M would have broadcast a 100+ MB map
    assert(!ext.DedupOps.broadcastFits(stringKeyed, 2000000L, mb64, 48L))
    assert(!ext.DedupOps.broadcastFits(stringKeyed, 1000000L, 0L, 48L))
  }
}
