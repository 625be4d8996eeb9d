package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-16 batch: the last empty-partition corpus windows
  * retired (smoothed target encode, normalized frequency encode, ntile
  * bin, ungrouped quantile gate), PrefixScan key/value-equality and
  * storage-level hardening, and the release-hook blast radius.
  */
class Round16Spec extends AnyFunSuite {
  import spark.implicits._

  /** WindowExec nodes with an EMPTY partitionSpec — the SinglePartition
    * funnel these ops must never plan. Walks adaptive wrappers like
    * Round15Spec's windowsIn.
    */
  private def emptyPartitionWindows(df: DataFrame): Int = {
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => n += 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  private def allWindows(df: DataFrame): Int = {
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: org.apache.spark.sql.execution.window.WindowExec => n += 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  // ---- the retired empty-partition corpus windows ----------------------

  test("targetEncodeSmoothed: broadcast global terms, no empty-partition window, values match the window formulation") {
    val orders = table("orders")
    val got = orders.targetEncodeSmoothed("o_orderpriority", "o_totalprice", m = 25.0).df
    assert(emptyPartitionWindows(got) == 0,
      "the global mean must come from an aggregate + broadcast crossJoin, not PARTITION BY ()")
    assert(allWindows(got) == 1, "exactly the category window survives")
    graft.core.ScaleLint.assertSafe(got)
    // bit-identical to the whole-frame-window formulation it replaced
    val t = col("o_totalprice").cast(graft.core.Exact.Wide)
    val wCat = Window.partitionBy(col("o_orderpriority"))
    val wAll = Window.partitionBy()
    val gMean = sum(t).over(wAll).cast("double") / count(t).over(wAll).cast("double")
    val want = orders.df.withColumn("o_orderpriority_target_enc_sm",
      (sum(t).over(wCat).cast("double") + lit(25.0) * gMean) /
        (count(t).over(wCat).cast("double") + lit(25.0)))
    assert(rows(got) == rows(want))
  }

  test("frequencyEncode(normalize): broadcast total, no empty-partition window, values match the window formulation") {
    val cust = table("customer")
    val got = cust.frequencyEncode("c_mktsegment", normalize = true).df
    assert(emptyPartitionWindows(got) == 0,
      "the total must come from an aggregate + broadcast crossJoin, not COUNT(*) OVER ()")
    assert(allWindows(got) == 1, "exactly the category window survives")
    graft.core.ScaleLint.assertSafe(got)
    val w = Window.partitionBy(col("c_mktsegment"))
    val want = cust.df.withColumn("c_mktsegment_freq",
      count(lit(1)).over(w).cast("double") /
        count(lit(1)).over(Window.partitionBy()).cast("double"))
    assert(rows(got) == rows(want))
    // the default (un-normalized) face keeps its single category window
    val plain = cust.frequencyEncode("c_mktsegment").df
    assert(emptyPartitionWindows(plain) == 0 && allWindows(plain) == 1)
  }

  test("bin(ntile): PrefixScan positions + bucket arithmetic match NTILE across n/b regimes, window-free plan") {
    // regimes: n divisible by b, remainder buckets, n < b, ties broken
    // by the tiebreak column, a null value (sorts first under ASC
    // NULLS FIRST, exactly as NTILE ranks it)
    val data = (0 until 53).map { i =>
      val v: java.lang.Double =
        if (i == 7) null else java.lang.Double.valueOf((i % 13).toDouble)
      (i.toLong, v)
    }
    val df = data.toDF("id", "v").repartition(5)
    for (b <- Seq(1, 4, 7, 53, 60)) {
      val got = Chain(spark, "nt16", df).bin("ntile", b, "v", tiebreak = Seq("id")).df
      assert(emptyPartitionWindows(got) == 0, s"b=$b planned a global window")
      assert(allWindows(got) == 0, s"b=$b planned a window at all")
      val want = df.withColumn("v_bin",
        ntile(b).over(Window.orderBy(col("v").asc, col("id").asc)))
      assert(rows(got) == rows(want), s"ntile mismatch at b=$b")
      graft.core.Chain.releaseCheckpoints(got)
    }
  }

  test("filterByQuantile ungrouped: distributed cutoff matches the window formulation incl. ties, null/NaN drops, both keeps") {
    // heavy ties (v = i % 7), nulls and NaNs sprinkled in
    val data = (0 until 140).map { i =>
      val v: java.lang.Double =
        if (i % 19 == 0) null
        else if (i % 23 == 0) java.lang.Double.valueOf(Double.NaN)
        else java.lang.Double.valueOf((i % 7).toDouble)
      (i.toLong, v)
    }
    val df = data.toDF("id", "v").repartition(6)
    for (q <- Seq(0.1, 0.5, 2.0 / 7.0, 0.999); k <- Seq("top", "bottom")) {
      val got = Chain(spark, "fq16", df).filterByQuantile("v", q, Nil, keep = k).df
      assert(allWindows(got) == 0, s"q=$q keep=$k planned a window")
      graft.core.ScaleLint.assertSafe(got)
      val usable = col("v").isNotNull && !isnan(col("v"))
      val cd = cume_dist().over(Window.partitionBy().orderBy(col("v").asc))
      val want = df.where(usable).withColumn("_cd", cd)
        .where(if (k == "top") col("_cd") > q else col("_cd") <= q)
        .select(col("id"), col("v"))
      assert(rows(got) == rows(want), s"quantile gate mismatch at q=$q keep=$k")
    }
  }

  test("filterByQuantile ungrouped pushes the cutoff predicate into the parquet scan") {
    val got = table("orders").filterByQuantile("o_totalprice", 0.9).df
    val scans = got.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("GreaterThanOrEqual(o_totalprice"),
      s"cutoff must reach the scan, got: $pushed")
  }

  // ---- PrefixScan hardening --------------------------------------------

  test("PrefixScan compares binary group keys by value (matches the window face)") {
    // two distinct Array[Byte] instances per logical key: reference
    // equality would start a new run at every row
    val rows17 = (0 until 40).map { i =>
      (i.toLong, Array[Byte]((i % 3).toByte, 7.toByte), (i % 5).toLong)
    }
    val df = rows17.toDF("id", "g", "w").repartition(4)
    val got = graft.core.PrefixScan.exclusivePrefixSum(
      df, Seq(col("g")), Seq(col("id")), col("w"), "cum")
    val want = df.withColumn("cum",
      coalesce(sum(col("w")).over(Window.partitionBy(col("g")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // hex the key for the comparison: Row.toString prints Array[Byte] by
    // identity, which is exactly the disease under test
    def cmp(df2: DataFrame) = rows(df2.withColumn("g", hex(col("g"))))
    assert(cmp(got) == cmp(want),
      "binary group keys must compare by value, not reference")
    graft.core.Chain.releaseCheckpoints(got)
  }

  test("PrefixScan honors spark.graft.prefixScan.storageLevel") {
    val key = "spark.graft.prefixScan.storageLevel"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "DISK_ONLY")
    try {
      val df = (0 until 30).map(i => (i.toLong, 1L)).toDF("id", "w")
      val got = graft.core.PrefixScan.exclusivePrefixSum(
        df, Nil, Seq(col("id")), col("w"), "cum")
      // find the checkpointed RDD buried below the plan-embedded map RDD
      def ckpt(rdd: org.apache.spark.rdd.RDD[_]): Seq[org.apache.spark.rdd.RDD[_]] =
        (if (rdd.isCheckpointed) Seq(rdd) else Seq.empty) ++
          (if (rdd.isCheckpointed) Seq.empty
           else rdd.dependencies.flatMap(d => ckpt(d.rdd)))
      val buried = got.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(ckpt)
      assert(buried.nonEmpty, "the PrefixScan checkpoint must be discoverable")
      assert(buried.forall(_.getStorageLevel ==
        org.apache.spark.storage.StorageLevel.DISK_ONLY),
        s"storage level must follow the conf key, got ${buried.map(_.getStorageLevel)}")
      assert(got.count() == 30)
      graft.core.Chain.releaseCheckpoints(got)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("releaseCheckpoints spares user-persisted RDDs below the checkpoint boundary") {
    val sc = spark.sparkContext
    val userRdd = sc.parallelize(0 until 20, 2)
      .map(i => org.apache.spark.sql.Row(i.toLong, (i % 3).toLong))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    userRdd.count()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType)))
    val userDf = spark.createDataFrame(userRdd, schema)
    try {
      // the user-persisted RDD sits DIRECTLY in the plan: the hook must
      // not unpersist it (it is not a checkpoint)
      Chain.releaseCheckpoints(userDf)
      assert(userRdd.getStorageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
        "a user-persisted plan RDD must survive releaseCheckpoints")
      // through a graft op: the checkpoint is released, the user cache
      // stays (the walk stops at the checkpoint boundary; the persisted
      // input is upstream of the range sort, not inside the truncated
      // lineage)
      val scanned = graft.core.PrefixScan.exclusivePrefixSum(
        userDf, Nil, Seq(col("id")), col("w"), "cum")
      Chain.releaseCheckpoints(scanned)
      assert(userRdd.getStorageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
        "the user cache upstream of a graft checkpoint must survive release")
    } finally userRdd.unpersist(true)
  }

  test("ungrouped aucProfile/spearmanCorr: distinct-value PrefixScan ranks, window-free plans, values equal the (single-group) window face") {
    // heavy ties on both rank columns; the grouped face over ONE constant
    // group runs the original window formulation — the two faces must
    // agree exactly (identical 2·midrank integers by construction)
    val data = (0 until 120).map { i =>
      (i.toLong, (i % 7).toDouble, ((i * 3) % 5).toDouble,
        if (i % 3 == 0) 1.0 else 0.0)
    }
    val df = data.toDF("id", "a", "b", "label").repartition(5)
    val g = df.withColumn("g", lit(0))
    val auc = Chain(spark, "auc16", df).aucProfile("a", "label").df
    assert(allWindows(auc) == 0, "ungrouped AUC planned a window")
    graft.core.ScaleLint.assertSafe(auc)
    val aucWant = Chain(spark, "auc16g", g)
      .aucProfile("a", "label", groupBy = Seq("g")).df.drop("g")
    assert(rows(auc) == rows(aucWant), "AUC faces disagree")
    val sp = Chain(spark, "sp16", df).spearmanCorr("a", "b").df
    assert(allWindows(sp) == 0, "ungrouped spearman planned a window")
    graft.core.ScaleLint.assertSafe(sp)
    val spWant = Chain(spark, "sp16g", g)
      .spearmanCorr("a", "b", groupBy = Seq("g")).df.drop("g")
    assert(rows(sp) == rows(spWant), "spearman faces disagree")
    graft.core.Chain.releaseCheckpoints(auc)
    graft.core.Chain.releaseCheckpoints(sp)
  }

  test("multi-weight PrefixScan: one scan equals two window cumsums, across partition boundaries") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val data = (0 until 150).map { i =>
        val g = if (i % 5 == 0) null else s"g${i % 3}"
        val wa: java.lang.Long = if (i % 11 == 0) null else java.lang.Long.valueOf((i % 7).toLong)
        (i.toLong, g, wa, (i % 4).toLong)
      }
      val df = data.toDF("id", "g", "wa", "wb").repartition(7)
      val got = graft.core.PrefixScan.exclusivePrefixSums(df,
        Seq(col("g")), Seq(col("id")),
        Seq(col("wa") -> "ca", col("wb") -> "cb"))
      val w = Window.partitionBy(col("g")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = df
        .withColumn("ca", coalesce(sum(col("wa")).over(w), lit(0L)))
        .withColumn("cb", coalesce(sum(col("wb")).over(w), lit(0L)))
      assert(rows(got) == rows(want))
      graft.core.Chain.releaseCheckpoints(got)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("multi-weight PrefixScan equals the window formulation across randomized shapes") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      for (seed <- Seq(3, 77, 1611)) {
        val rnd = new scala.util.Random(seed)
        val nGroups = 1 + rnd.nextInt(5)
        val n = 40 + rnd.nextInt(250)
        val nW = 1 + rnd.nextInt(3)
        val data = (0 until n).map { _ =>
          val g = if (rnd.nextInt(9) == 0) null else s"g${rnd.nextInt(nGroups)}"
          def w(): java.lang.Long =
            if (rnd.nextInt(11) == 0) null else java.lang.Long.valueOf(rnd.nextInt(8).toLong)
          (rnd.nextLong(), g, w(), w(), w())
        }
        val df = data.toDF("id", "g", "w0", "w1", "w2").repartition(6)
        val weights = (0 until nW).map(i => col(s"w$i") -> s"c$i")
        val got = graft.core.PrefixScan.exclusivePrefixSums(
          df, Seq(col("g")), Seq(col("id")), weights)
        val win = Window.partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val want = weights.foldLeft(df) { case (d, (w, out)) =>
          d.withColumn(out, coalesce(sum(w).over(win), lit(0L)))
        }
        assert(rows(got) == rows(want), s"seed $seed (n=$n, groups=$nGroups, weights=$nW)")
        graft.core.Chain.releaseCheckpoints(got)
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("ungrouped census ops (ks/chi2/jsd/gini) equal their single-constant-group window faces, window-free plans") {
    val a = (0 until 90).map(i => (i.toLong, (i % 9).toDouble, s"v${i % 6}"))
      .toDF("id", "x", "v").repartition(4)
    val b = (0 until 70).map(i => (i.toLong, ((i * 2) % 9).toDouble, s"v${i % 5}"))
      .toDF("id", "x", "v").repartition(3)
    val ag = a.withColumn("g", lit(0))
    val bg = b.withColumn("g", lit(0))
    def check(name: String, got: DataFrame, want: DataFrame): Unit = {
      assert(allWindows(got) == 0, s"$name planned a window ungrouped")
      graft.core.ScaleLint.assertSafe(got)
      assert(rows(got) == rows(want.drop("g")), s"$name faces disagree")
      graft.core.Chain.releaseCheckpoints(got)
    }
    check("ksProfile",
      Chain(spark, "ks16", a).ksProfile(b, "x").df,
      Chain(spark, "ks16g", ag).ksProfile(bg, "x", Seq("g")).df)
    check("chiSquareHomogeneity",
      Chain(spark, "chi16", a).chiSquareHomogeneity(b, "v").df,
      Chain(spark, "chi16g", ag).chiSquareHomogeneity(bg, "v", Seq("g")).df)
    check("jsdProfile",
      Chain(spark, "jsd16", a).jsdProfile(b, "v").df,
      Chain(spark, "jsd16g", ag).jsdProfile(bg, "v", Seq("g")).df)
    check("giniConcentration",
      Chain(spark, "gini16", a).giniConcentration("v").df,
      Chain(spark, "gini16g", ag).giniConcentration("v", Seq("g")).df)
    // tClosenessViolations / uniMaxAllocation have no grouped twin — their
    // exact outputs are pinned by the driver oracles and the hand-example
    // specs; here just pin the window-free plans
    val tc = Chain(spark, "tc16",
      a.withColumn("q", col("id") % 4).withColumn("s", col("v")))
      .tClosenessViolations(Seq("q"), "s", tFp = 1L).df
    // class/value-partitioned windows stay; only the global one is gone
    assert(emptyPartitionWindows(tc) == 0, "tCloseness planned a global window")
    val um = Chain(spark, "um16",
      a.withColumn("n_tok", col("id") % 50 + 1)).uniMaxAllocation("v", "n_tok", 500L, 2).df
    assert(allWindows(um) == 0, "uniMaxAllocation planned a window")
    graft.core.Chain.releaseCheckpoints(tc)
    graft.core.Chain.releaseCheckpoints(um)
  }

  test("ungrouped winsorize/robustScaler/flagOutliers(+robust) equal their single-constant-group window faces, no empty-partition windows") {
    // ties, nulls and NaNs across partitions; bounds/statistics must be
    // identical to the window formulation run over ONE constant group
    val data = (0 until 130).map { i =>
      val v: java.lang.Double =
        if (i % 17 == 0) null
        else if (i % 23 == 0) java.lang.Double.valueOf(Double.NaN)
        else java.lang.Double.valueOf(((i * 7) % 19).toDouble)
      (i.toLong, v)
    }
    val df = data.toDF("id", "v").repartition(5)
    val g = df.withColumn("g", lit(0))
    def check(name: String, got: DataFrame, want: DataFrame): Unit = {
      assert(emptyPartitionWindows(got) == 0, s"$name planned a global window")
      graft.core.ScaleLint.assertSafe(got)
      assert(rows(got) == rows(want.drop("g")), s"$name faces disagree")
    }
    check("winsorize",
      Chain(spark, "w16", df).winsorize("v", pLow = 0.1, pHigh = 0.9).df,
      Chain(spark, "w16g", g).winsorize("v", Seq("g"), pLow = 0.1, pHigh = 0.9).df)
    check("robustScaler",
      Chain(spark, "rs16", df).robustScaler("v").df,
      Chain(spark, "rs16g", g).robustScaler("v", Seq("g")).df)
    check("flagOutliers",
      Chain(spark, "fo16", df).flagOutliers("v", z = 1.0).df,
      Chain(spark, "fo16g", g).flagOutliers("v", Seq("g"), z = 1.0).df)
    check("flagOutliersRobust",
      Chain(spark, "fr16", df).flagOutliersRobust("v", z = 1.0).df,
      Chain(spark, "fr16g", g).flagOutliersRobust("v", Seq("g"), z = 1.0).df)
  }

  test("ungrouped quantileNormalize (exact + sketch): PrefixScan tie ranks, no corpus windows, equal to the single-group face") {
    val data = (0 until 110).map { i =>
      val v: java.lang.Double =
        if (i % 13 == 0) null
        else if (i % 29 == 0) java.lang.Double.valueOf(Double.NaN)
        else java.lang.Double.valueOf(((i * 5) % 23).toDouble)
      (i.toLong, v)
    }
    val df = data.toDF("id", "v").repartition(5)
    val g = df.withColumn("g", lit(0))
    val got = Chain(spark, "qn16", df).quantileNormalize("v").df
    assert(allWindows(got) == 0, "ungrouped exact face planned a window")
    graft.core.ScaleLint.assertSafe(got)
    val want = Chain(spark, "qn16g", g).quantileNormalize("v", Seq("g")).df
    assert(rows(got) == rows(want.drop("g")), "exact faces disagree")
    val gotSk = Chain(spark, "qns16", df).quantileNormalizeSketch("v").df
    assert(allWindows(gotSk) == 0, "ungrouped sketch face planned a window")
    val wantSk = Chain(spark, "qns16g", g).quantileNormalizeSketch("v", Seq("g")).df
    assert(rows(gotSk) == rows(wantSk.drop("g")), "sketch faces disagree")
    graft.core.Chain.releaseCheckpoints(got)
    graft.core.Chain.releaseCheckpoints(gotSk)
  }

  test("lint: a global limit <= 4096 proves a bounded nested-loop build side") {
    val docs = table("documents").df
    val capped = docs.crossJoin(docs.select(col("doc_id").as("d2")).limit(10))
    val fs = graft.core.ScaleLint.lint(capped)
    assert(!fs.exists(_.rule == "nested-loop-join"),
      s"a limit(10) build side must not lint error: $fs")
    assert(fs.exists(f => f.rule == "nested-loop-join-bounded" ||
      f.rule == "nested-loop-join-aggregated" || f.severity == "info"),
      s"the bounded shape should surface at info level: $fs")
    // an uncapped corpus build side still errors
    val uncapped = docs.crossJoin(docs.select(col("doc_id").as("d2")))
    assert(graft.core.ScaleLint.lint(uncapped).exists(_.rule == "nested-loop-join"),
      "an unbounded cross join must still lint error")
  }

  // ---- ScaleLint: IsNotNull over CASE ... ELSE false proves nothing ----

  test("lint: IsNotNull(CASE .. ELSE false) is always-true and must not bound the window key") {
    val docs = table("documents").df
    // ELSE false under IS NOT NULL: false IS NOT NULL = true — every row
    // passes, the key domain is NOT the branch list
    val alwaysTrue = docs
      .withColumn("_flag", when(col("lang") === "en", lit(true)).otherwise(lit(false)))
      .where(col("_flag").isNotNull)
      .withColumn("_pos", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    assert(!graft.core.ScaleLint.lint(alwaysTrue)
      .exists(_.rule == "low-domain-window-key"),
      "ELSE false under IS NOT NULL passes every row; no domain bound exists")
    // the genuine dropping shape (ELSE null) must still prove the bound —
    // Round15Spec pins the full retired-interleave form; this pins the
    // minimal one
    val dropping = docs
      .withColumn("_w", when(col("lang") === "en", lit(3L))
        .otherwise(lit(null).cast("long")))
      .where(col("_w").isNotNull)
      .withColumn("_pos", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    assert(graft.core.ScaleLint.lint(dropping)
      .exists(_.rule == "low-domain-window-key"),
      "ELSE null under IS NOT NULL still proves the live domain")
  }

}
