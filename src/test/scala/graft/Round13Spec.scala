package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import TestSpark._

/** Gates for the round-13 batch: the one-corpus-scan grouped histogram
  * (the last corpus-side spine distinct, rewritten onto the
  * calibrationProfile null-bucket fold), its all-excluded-group and
  * null-group contracts, the reserved-name guard the new internal
  * columns require, and the grouped PSI faces (per-slice drift — the
  * last ungrouped census family member).
  */
class Round13Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- histogram: one-scan grouped face (round-12 verdict ask #1) --------

  test("histogram grouped: ONE corpus scan in the physical plan") {
    val df = Chain(spark, "hist_scan",
      spark.read.parquet(s"$sfDir/orders.parquet"))
      .histogram("o_totalprice", 0.0, 500000.0, 8,
        groupBy = Seq("o_orderstatus")).df
    df.collect()
    val scans = countScans(df.queryExecution.executedPlan)
    assert(scans == 1,
      s"grouped histogram must scan the corpus exactly once, got $scans")
  }

  test("histogram grouped: all-excluded groups still emit zero-count buckets") {
    // b: only out-of-range; c: only NaN; d: only null — all three must
    // surface with a full spine of cnt = 0 (group discovery rides the
    // null bucket of the single aggregate)
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(9.0)), ("b", Some(99.0)),
      ("c", Some(Double.NaN)), ("d", Option.empty[Double]))
      .toDF("g", "x")
    val c = Chain(spark, "hgo", df).histogram("x", 0.0, 10.0, 2,
      groupBy = Seq("g"))
    val got = c.df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("cnt")).toMap
    assert(got.size == 8, s"4 groups x 2 buckets expected, got $got")
    for (g <- Seq("b", "c", "d"); b <- Seq(0L, 1L))
      assert(got((g, b)) == 0L, s"all-excluded group $g bucket $b must be 0")
    assert(got(("a", 0L)) == 1L && got(("a", 1L)) == 1L)
    df.createOrReplaceTempView("hgo")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("histogram grouped: NULL group value keeps its counts; SQL face agrees") {
    val df = Seq((Some("a"), 1.0), (Option.empty[String], 2.0), (None, 7.0))
      .toDF("g", "x")
    val c = Chain(spark, "hng", df).histogram("x", 0.0, 10.0, 2,
      groupBy = Seq("g"))
    val nullG = c.df.where(col("g").isNull).collect()
      .map(r => r.getLong(1) -> r.getAs[Long]("cnt")).toMap
    assert(nullG == Map(0L -> 1L, 1L -> 1L),
      s"null group must carry its real counts, got $nullG")
    df.createOrReplaceTempView("hng")
    assert(rows(spark.sql(c.sql())) == rows(c.df))
  }

  test("histogram: group columns colliding with output/internal names refuse") {
    val df = Seq((1.0, 0L)).toDF("x", "bucket")
    val e = intercept[IllegalArgumentException] {
      Chain(spark, "hrs", df).histogram("x", 0.0, 10.0, 2,
        groupBy = Seq("bucket"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("histogram grouped: empty input completes with zero rows") {
    val empty = Seq.empty[(String, Double)].toDF("g", "x")
    val c = Chain(spark, "hge", empty).histogram("x", 0.0, 10.0, 4,
      groupBy = Seq("g"))
    assert(c.df.count() == 0)
  }

  // ---- ScaleLint: corpus-rescan spine (round-12 verdict ask #2) -----------

  private def hasRescanSpine(df: org.apache.spark.sql.DataFrame): Boolean =
    graft.core.ScaleLint.lint(df).exists(_.rule == "corpus-rescan-spine")

  test("ScaleLint flags the pre-fix histogram shape: distinct-spine branch beside an aggregate") {
    // the exact round-10 grouped-histogram shape this round designed out
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val x = col("o_totalprice").cast("double")
    val b = least(floor(x / lit(62500.0)).cast("long"), lit(7L))
    val counts = o.where(x.isNotNull && x >= 0.0 && x <= 500000.0)
      .groupBy(col("o_orderstatus"), b.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val spine = o.select(col("o_orderstatus")).distinct()
      .crossJoin(broadcast(spark.range(8).select(col("id").as("bucket"))))
    val joined = spine.join(counts, Seq("o_orderstatus", "bucket"), "left")
    assert(hasRescanSpine(joined),
      "the distinct->crossJoin(Range) + aggregate double-scan must lint")
  }

  test("ScaleLint: the audited window-grid exchange-reuse shape does NOT lint") {
    // review-confirmed false positive: driftByWindowQuantile's grid is a
    // distinct over the WINDOW-COUNT AGGREGATE's bounded output, not over
    // the corpus — but physical planning duplicates the aggregate subtree
    // per branch, so the old reference-equality (`eq`) shared-aggregate
    // exclusion never matched. The rule now exempts any scan whose OWN
    // path passes a real aggregate below the distinct.
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    assert(!hasRescanSpine(graft.streaming.EventStreams
        .driftByWindowQuantile(ev, ev.where("event_id % 50 = 0"),
          "value", "1 hour", 4)),
      "a distinct over an aggregate's bounded output must not lint as a corpus rescan")
  }

  test("ScaleLint: post-fix grouped histogram and datespine_groups stay clean") {
    val ordersC = table("orders")
    assert(!hasRescanSpine(ordersC
        .histogram("o_totalprice", 0.0, 500000.0, 8,
          groupBy = Seq("o_orderstatus")).df),
      "the one-scan grouped histogram must not lint")
    // datespine_groups: the distinct IS the op's semantics — its spine
    // arrives via a generator and the second corpus branch is
    // row-preserving, so the rule's structure excludes it BY SHAPE,
    // not by name
    assert(!hasRescanSpine(ordersC
        .datespineGroups(Seq("o_orderstatus"), "o_orderdate",
          "1995-01-01", "1995-01-31").df),
      "datespine_groups' semantic distinct must not lint")
  }

  // ---- grouped PSI faces (round-12 verdict ask #3) -------------------------

  // groups: "a" healthy on both sides (plus a null and a NaN value row);
  // "b" base-only; "c" out-of-range for the equal-width face; null group
  // with rows on both sides; "d" other-only; "e" all-null values (visible
  // with zero counts in the spined faces, zero rows in the categorical)
  private def psiFixture = {
    val base = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(2.0)), (Some("a"), Some(9.0)),
      (Some("a"), Option.empty[Double]), (Some("a"), Some(Double.NaN)),
      (Some("b"), Some(3.0)), (Some("b"), Some(4.0)),
      (Some("c"), Some(99.0)),
      (Some("e"), Option.empty[Double]),
      (Option.empty[String], Some(5.0)), (None, Some(6.0))).toDF("g", "x")
    val other = Seq(
      (Some("a"), Some(8.0)), (Some("a"), Some(1.5)),
      (Some("c"), Some(120.0)),
      (Option.empty[String], Some(2.5)),
      (Some("d"), Some(7.0))).toDF("g", "x")
    (base, other)
  }
  private val psiGroups =
    Seq(Some("a"), Some("b"), Some("c"), None, Some("d"), Some("e"))
  private def gFilter(g: Option[String]) =
    g.map(v => col("g") === v).getOrElse(col("g").isNull)

  test("psiProfile grouped equals the per-segment ungrouped runs") {
    val (base, other) = psiFixture
    val grouped = Chain(spark, "pg", base)
      .psiProfile(other, "x", 0.0, 10.0, 4, groupBy = Seq("g")).df
    assert(grouped.count() == psiGroups.size * 4L,
      "every group seen on either side must emit its full bucket spine")
    for (g <- psiGroups) {
      val solo = Chain(spark, "ps", base.where(gFilter(g)))
        .psiProfile(other.where(gFilter(g)), "x", 0.0, 10.0, 4).df
      assert(rows(grouped.where(gFilter(g)).drop("g")) == rows(solo),
        s"group $g must match its own ungrouped run")
    }
  }

  test("psiQuantileProfile grouped equals the per-segment ungrouped runs") {
    val (base, other) = psiFixture
    val grouped = Chain(spark, "pqg", base)
      .psiQuantileProfile(other, "x", 3, groupBy = Seq("g")).df
    assert(grouped.count() == psiGroups.size * 3L)
    for (g <- psiGroups) {
      val solo = Chain(spark, "pqs", base.where(gFilter(g)))
        .psiQuantileProfile(other.where(gFilter(g)), "x", 3).df
      assert(rows(grouped.where(gFilter(g)).drop("g")) == rows(solo),
        s"group $g must match its own ungrouped run")
    }
  }

  test("psiCategoricalProfile grouped equals the per-segment ungrouped runs") {
    val (base, other) = psiFixture
    // x doubles cast to strings are the categorical values here
    val grouped = Chain(spark, "pcg", base)
      .psiCategoricalProfile(other, "x", groupBy = Seq("g")).df
    for (g <- psiGroups) {
      val solo = Chain(spark, "pcs", base.where(gFilter(g)))
        .psiCategoricalProfile(other.where(gFilter(g)), "x").df
      assert(rows(grouped.where(gFilter(g)).drop("g")) == rows(solo),
        s"group $g must match its own ungrouped run")
    }
    // no spine to pad: the all-null-value group yields zero rows, exactly
    // like its own ungrouped run
    assert(grouped.where(col("g") === "e").isEmpty)
  }

  test("psiProfile grouped: ONE scan per side in the physical plan") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val df = Chain(spark, "pgs", o.where("o_orderstatus = 'F'"))
      .psiProfile(o.where("o_orderstatus = 'O'"), "o_totalprice",
        0.0, 500000.0, 8, groupBy = Seq("o_orderpriority")).df
    df.collect()
    val scans = countScans(df.queryExecution.executedPlan)
    assert(scans == 2,
      s"grouped psi must scan each side exactly once, got $scans")
  }

  test("psiQuantileProfile grouped: returned plan carries the base side only as literals") {
    val basePq = spark.read.parquet(s"$sfDir/orders.parquet")
      .where("o_orderstatus = 'F'")
    val otherMem = Seq(("1-URGENT", 1000.0)).toDF("o_orderpriority", "o_totalprice")
    val df = Chain(spark, "pql", basePq)
      .psiQuantileProfile(otherMem, "o_totalprice", 4,
        groupBy = Seq("o_orderpriority")).df
    df.collect()
    val scans = countScans(df.queryExecution.executedPlan)
    assert(scans == 0,
      s"base must fold to literal cutoff/count frames — no corpus FileScan " +
        s"in the returned plan, got $scans")
  }

  test("psi grouped: reserved group names and internal prefixes refuse") {
    val df = Seq((1.0, 0L)).toDF("x", "bucket")
    val e1 = intercept[IllegalArgumentException] {
      Chain(spark, "pr1", df).psiProfile(df, "x", 0.0, 1.0, 2,
        groupBy = Seq("bucket"))
    }
    assert(e1.getMessage.contains("collide"))
    val df2 = Seq((1.0, "z")).toDF("x", "_t_g")
    val e2 = intercept[IllegalArgumentException] {
      Chain(spark, "pr2", df2).psiQuantileProfile(df2, "x", 2,
        groupBy = Seq("_t_g"))
    }
    assert(e2.getMessage.contains("reserved internal prefixes"))
  }

  test("psiQuantileProfile grouped: maxGroups cap refuses loudly") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "x")
    val e = intercept[IllegalArgumentException] {
      Chain(spark, "pmx", df).psiQuantileProfile(df, "x", 2,
        groupBy = Seq("g"), maxGroups = 1)
    }
    assert(e.getMessage.contains("maxGroups"))
  }

  // ---- profile-fed salted join (round-12 verdict ask #5) -------------------

  private def saltFixture = {
    // "h": hot (7 left rows > minHotCount=2); "c": cold (2 rows, not
    // strictly above); null key never hot and never matches
    val left = ((1 to 7).map(i => (Some("h"), i)) ++
      Seq((Some("c"), 8), (Some("c"), 9), (Option.empty[String], 10)))
      .toDF("k", "lv")
    val right = Seq((Some("h"), 100), (Some("h"), 101), (Some("c"), 200),
      (Some("x"), 300), (Option.empty[String], 400)).toDF("rk", "rv")
    (left, right)
  }

  test("joinSaltedAuto: only profiled hot keys salt, ns proportional and capped") {
    val (left, _) = saltFixture
    val hot = JoinOps.hotKeySaltCounts(left, Seq("k"),
      minHotCount = 2L, maxHotKeys = 10, saltBuckets = 3)
    assert(hot.map(r => r.getString(0) -> r.getInt(1)).toMap == Map("h" -> 3),
      "only 'h' crosses the threshold; ns = ceil(7/2) = 4 capped at 3")
    val hotLow = JoinOps.hotKeySaltCounts(left, Seq("k"),
      minHotCount = 3L, maxHotKeys = 10, saltBuckets = 16)
    assert(hotLow.map(r => r.getString(0) -> r.getInt(1)).toMap == Map("h" -> 3),
      "uncapped: ns = ceil(7/3) = 3")
  }

  test("joinSaltedAuto: cold right rows are NOT replicated, hot replicate ns times") {
    val (left, right) = saltFixture
    val rows = JoinOps.hotKeySaltCounts(left, Seq("k"), 2L, 10, 3)
    val hotF = JoinOps.hotKeyLiteral(spark, rows, Seq("rk"),
      Seq(left.schema("k").dataType))
    val salted = JoinOps.saltedRight(right, hotF, Seq("rk"))
      .groupBy("rk").agg(count(lit(1)).as("n")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(salted == Map(Some("h") -> 6L, Some("c") -> 1L, Some("x") -> 1L,
      None -> 1L),
      s"hot 'h' rows replicate ns=3 times each (2 rows -> 6), everything " +
        s"else exactly once, got $salted")
    // and the left side never changes its row count
    val lSalted = JoinOps.saltedLeft(left,
      JoinOps.hotKeyLiteral(spark, rows, Seq("k"), Seq(left.schema("k").dataType)))
    assert(lSalted.count() == left.count())
    assert(lSalted.where(col("k") === "c" || col("k").isNull)
      .select("_salt").distinct().collect().map(_.getInt(0)).toSeq == Seq(0),
      "cold/null-key left rows keep salt 0")
  }

  test("joinSaltedAuto equals the plain join (inner and left, null keys, empty hot set)") {
    val (left, right) = saltFixture
    for (jt <- Seq("inner", "left")) {
      val auto = Chain(spark, "jsa", left).joinSaltedAuto(
        Chain(spark, "jsar", right), jt, Seq("k" -> "rk"),
        saltBuckets = 3, minHotCount = 2, maxHotKeys = 10).df
      val plain = Chain(spark, "jsp", left).join(
        Chain(spark, "jspr", right), jt, Seq("k" -> "rk")).df
      assert(rows(auto) == rows(plain), s"$jt auto-salted join must equal plain")
    }
    // every key cold -> empty hot frame -> degenerate plain join
    val autoCold = Chain(spark, "jsc", left).joinSaltedAuto(
      Chain(spark, "jscr", right), "inner", Seq("k" -> "rk"),
      saltBuckets = 4, minHotCount = 100, maxHotKeys = 10).df
    val plainCold = Chain(spark, "jscp", left).join(
      Chain(spark, "jscpr", right), "inner", Seq("k" -> "rk")).df
    assert(rows(autoCold) == rows(plainCold))
  }

  test("joinSaltedAuto: reserved internal names refuse") {
    val df = Seq((1, 2)).toDF("k", "_salt")
    val e = intercept[IllegalArgumentException] {
      Chain(spark, "jsg", df).joinSaltedAuto(Chain(spark, "jsg2", df),
        "inner", Seq("k" -> "k"))
    }
    assert(e.getMessage.contains("_salt"))
  }

  // ---- ADVICE round 12: replay-guard checkpoint identity -------------------

  test("replay guard: a checkpoint RECREATED at the same path reprocesses; corrupt markers fall back") {
    import graft.streaming.EventStreams
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def writeMeta(id: String): Unit = {
      val w = new java.io.PrintWriter(s"$ckpt/metadata")
      try w.write(s"""{"id":"$id"}""") finally w.close()
    }
    writeMeta("11111111-1111-1111-1111-111111111111")
    val tbl = "r13_replay_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1, 2)).toDF("a", "b").write.saveAsTable(tbl)
    try {
      EventStreams.markBatchApplied(spark, tbl,
        EventStreams.checkpointIdentity(spark, ckpt), 5L)
      assert(EventStreams.batchAlreadyApplied(spark, tbl, ckpt, 5L),
        "same incarnation: a re-fired batch 5 is a replay")
      assert(EventStreams.batchAlreadyApplied(spark, tbl, ckpt, 3L))
      assert(!EventStreams.batchAlreadyApplied(spark, tbl, ckpt, 6L))
      // the rm-rf-and-rerun reprocess: SAME path, fresh stream uuid —
      // batches 0..5 must re-apply, not silently drop (ADVICE medium)
      writeMeta("22222222-2222-2222-2222-222222222222")
      assert(!EventStreams.batchAlreadyApplied(spark, tbl, ckpt, 5L),
        "a recreated checkpoint at the same path must not read as applied")
      // an unparseable marker reads as "not applied" — at-least-once
      // fallback, never a stream-killing NumberFormatException
      val ident = EventStreams.checkpointIdentity(spark, ckpt)
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
        s"('graft.applied_batch' = 'garbage@$ident')")
      assert(!EventStreams.batchAlreadyApplied(spark, tbl, ckpt, 0L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  // ---- bounded incremental close (round-12 verdict ask #6) -----------------

  private val evtBase = 1704067200L * 1000000000L
  private def evt(id: Long, minute: Long, user: Long, tpe: String) =
    Evt(id, evtBase + minute * 60L * 1000000000L, user, tpe, 1.0, "{}")

  private def scanPartitionFilters(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.FileSourceScanExec
    df.collect()
    val out = scala.collection.mutable.Buffer[String]()
    def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
      n match {
        case f: FileSourceScanExec => out ++= f.partitionFilters.map(_.toString)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => ()
      }
      n match {
        case _: AdaptiveSparkPlanExec | _: QueryStageExec => ()
        case _ => n.children.foreach(walk); n.subqueries.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  test("funnelCloseIncremental: converges to the batch face under late data, touched slice only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    implicit val sqlCtx = spark.sqlContext
    for (t <- Seq("fci_acts", "fci_acts_journal", "fci_chain"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    // batch 1: user 1 has B(10) BEFORE A(20) -> B must not count; user 2
    // completes nothing past A. batch 2 delivers a LATE A(5) for user 1,
    // which makes B(10) count — only user 1's chain may re-derive.
    val b1 = Seq(evt(1, 20, 1, "A"), evt(2, 10, 1, "B"), evt(3, 40, 2, "A"))
    val b2 = Seq(evt(4, 5, 1, "A"))
    def drain(events: Seq[Evt]): Unit = {
      val ms = MemoryStream[Evt]
      ms.addData(events: _*)
      EventStreams.sinkFunnelActivityToTable(ms.toDF(), "event_type",
        Seq("A", "B"), "fci_acts",
        java.nio.file.Files.createTempDirectory("graft_ckpt_fci").toString,
        incrementalBuckets = Some(4))
    }
    drain(b1)
    val close1 = EventStreams.funnelCloseIncremental(spark, "fci_acts",
      "fci_chain", "event_type", Seq("A", "B"))
    assert(close1.where(col("step") === 2).collect()(0).getLong(2) == 0L,
      "B-before-A must not count before the late arrival")
    assert(spark.table("fci_acts_journal").isEmpty,
      "the close must consume and truncate the journal")
    drain(b2)
    // the journal knows exactly who the late batch touched
    val touched = spark.table("fci_acts_journal").distinct()
    assert(touched.select("user_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // plan pin: the re-derive slice is partition-PRUNED on _ub and
    // carries only the touched user's rows
    val slice = EventStreams.touchedActivitySlice(spark, "fci_acts",
      touched, Seq("user_id"))
    assert(slice.select("user_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L),
      "the incremental close must re-derive only touched users")
    assert(scanPartitionFilters(slice).exists(_.contains("_ub")),
      "the activity scan must be partition-pruned on _ub")
    val close2 = EventStreams.funnelCloseIncremental(spark, "fci_acts",
      "fci_chain", "event_type", Seq("A", "B"))
    val want = EventStreams.funnelProfile((b1 ++ b2).toDF(), "event_type",
      Seq("A", "B"))
    assert(rows(close2) == rows(want),
      "incremental close must equal the all-events batch face under late data")
    // idempotent re-close on an empty journal: same profile
    assert(rows(EventStreams.funnelCloseIncremental(spark, "fci_acts",
      "fci_chain", "event_type", Seq("A", "B"))) == rows(want))
    // the latency twin closes from the SAME stored chains — no activity
    // rescan — and equals the all-events batch face
    assert(rows(EventStreams.funnelLatencyFromChains(spark, "fci_chain",
      Seq("A", "B"), Seq(0.5))) ==
      rows(EventStreams.funnelLatency((b1 ++ b2).toDF(), "event_type",
        Seq("A", "B"), Seq(0.5))),
      "latency-from-chains must equal the all-events batch face")
  }

  test("cohortCloseIncremental: grouped, converges under a late first-day event") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    implicit val sqlCtx = spark.sqlContext
    for (t <- Seq("cci_acts", "cci_acts_journal", "cci_state"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    val day = 24 * 60L
    val b1 = Seq(evt(1, day, 1, "e"), evt(2, day + 5, 1, "e"), evt(3, 10, 2, "e"))
    val b2 = Seq(evt(5, 20, 1, "e")) // late: moves user 1's cohort to day 0
    def withSeg(events: Seq[Evt]) =
      events.toDF().withColumn("plat",
        expr("CASE WHEN event_id % 2 = 0 THEN 'b' ELSE 'a' END"))
    def drain(events: Seq[Evt]): Unit = {
      val ms = MemoryStream[Evt]
      ms.addData(events: _*)
      EventStreams.sinkCohortActivityToTable(
        ms.toDF().withColumn("plat",
          expr("CASE WHEN event_id % 2 = 0 THEN 'b' ELSE 'a' END")),
        "cci_acts",
        java.nio.file.Files.createTempDirectory("graft_ckpt_cci").toString,
        groupBy = Seq("plat"), incrementalBuckets = Some(4))
    }
    drain(b1)
    EventStreams.cohortCloseIncremental(spark, "cci_acts", "cci_state",
      groupBy = Seq("plat")).collect()
    drain(b2)
    val got = rows(EventStreams.cohortCloseIncremental(spark, "cci_acts",
      "cci_state", groupBy = Seq("plat")))
    val want = rows(EventStreams.cohortRetention(withSeg(b1 ++ b2),
      "user_id", groupBy = Seq("plat")))
    assert(got == want,
      "incremental cohort close must equal the all-events batch face")
  }

  // ---- IVF multi-assignment frontier point (round-12 verdict ask #7) ------

  test("ivf multi-assignment: pairs dedup, exact-k ranks, recall never below single-assign") {
    import graft.ext._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val c = Chain(spark, "ivfm", emb)
    val q = emb.where("vec_id < 5")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = c.ivfCosineTopK(q, "vec_id", "embedding", 5, nlist = 8, nprobe = 2).df
    val r2 = c.ivfCosineTopK(q, "vec_id", "embedding", 5, nlist = 8, nprobe = 2,
      assign = 2).df
    // duplicated candidates from two probed cells must dedup pre-rank
    assert(r2.groupBy("query_id", "neighbor_id").count()
      .where(col("count") > 1).isEmpty,
      "multi-assignment must not emit duplicate (query, neighbor) pairs")
    // ranks stay contiguous 1..k' per query
    val ranks = r2.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx")).collect()
    assert(ranks.forall(r => r.getLong(1) == r.getInt(2).toLong),
      "ranks must stay contiguous after the dedup")
    // a=2's candidate sets are supersets of a=1's (same probes, fuller
    // cells), and both faces break ties identically — recall vs the
    // exact top-k is monotone in the candidate set
    val exact = pairSet(c.cosineTopK(q, "vec_id", "embedding", 5).df)
    assert(pairSet(r2).intersect(exact).size >= pairSet(r1).intersect(exact).size,
      "multi-assignment may never lose recall at the same probe budget")
    // a = 1 path is byte-identical to the pre-change op (bestCellId)
    assert(rows(r1) == rows(c.ivfCosineTopK(q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 2, assign = 1).df))
  }

  test("round-13 ops scale shape: lint-safe on file scans") {
    import graft.streaming.EventStreams
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    graft.core.ScaleLint.assertSafe(
      Chain(spark, "lso", orders.where("o_orderstatus = 'F'"))
        .psiProfile(orders.where("o_orderstatus = 'O'"), "o_totalprice",
          0.0, 500000.0, 8, groupBy = Seq("o_orderpriority")).df)
    graft.core.ScaleLint.assertSafe(
      Chain(spark, "lsq", orders.where("o_orderstatus = 'F'"))
        .psiQuantileProfile(orders.where("o_orderstatus = 'O'"),
          "o_totalprice", 4, groupBy = Seq("o_orderpriority")).df)
    graft.core.ScaleLint.assertSafe(
      Chain(spark, "lsj", lineitem).joinSaltedAuto(
        Chain(spark, "lsjr", orders), "inner",
        Seq("l_orderkey" -> "o_orderkey"), saltBuckets = 4,
        minHotCount = 3, maxHotKeys = 100).df)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    graft.core.ScaleLint.assertSafe(EventStreams.heavyHittersByWindow(
      ev, "user_id", "1 hour", 5, slide = Some("30 minutes")))
  }

  test("hopping ByWindow faces: reserved key names refuse") {
    import graft.streaming.EventStreams
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    intercept[IllegalArgumentException] {
      EventStreams.heavyHittersByWindow(
        ev.withColumnRenamed("event_type", "rank"), "user_id", "1 hour", 5,
        keys = Seq("rank"), slide = Some("30 minutes"))
    }
    intercept[IllegalArgumentException] {
      EventStreams.distinctByWindow(
        ev.withColumnRenamed("event_type", "n"), "user_id", "1 hour",
        keys = Seq("n"), slide = Some("30 minutes"))
    }
  }

  // ---- scd2Merge: SCD type-2 dimension maintenance ------------------------

  private def scdDate(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  /** History fixture exercising every branch: k1 unchanged (plus a closed
    * old version that must pass through), k2 changed, k3 missing from the
    * snapshot, k4 brand new, k5 previously closed and re-appearing, and a
    * NULL key that must match the snapshot's NULL key null-safely.
    */
  private def scdFixture = {
    val hist = Seq(
      (Some("k1"), Some(10.0), scdDate("1990-01-01"), Option.empty[java.sql.Date], true),
      (Some("k1"), Some(5.0), scdDate("1985-01-01"), Some(scdDate("1990-01-01")), false),
      (Some("k2"), Some(20.0), scdDate("1990-01-01"), Option.empty[java.sql.Date], true),
      (Some("k3"), Some(30.0), scdDate("1990-01-01"), Option.empty[java.sql.Date], true),
      (Some("k5"), Some(50.0), scdDate("1985-01-01"), Some(scdDate("1990-01-01")), false),
      (Option.empty[String], Option.empty[Double], scdDate("1990-01-01"),
        Option.empty[java.sql.Date], true))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    val snap = Seq(
      (Some("k1"), Some(10.0)), (Some("k2"), Some(25.0)), (Some("k4"), Some(44.0)),
      (Some("k5"), Some(55.0)), (Option.empty[String], Option.empty[Double]))
      .toDF("k", "v")
    (hist, snap)
  }

  test("scd2Merge: every branch lands — unchanged, changed, missing, new, re-appearing, null key") {
    val (hist, snap) = scdFixture
    val out = Chain(spark, "scd_h", hist)
      .scd2Merge(Chain(spark, "scd_s", snap), Seq("k"), Seq("v"),
        "1995-06-01", closeMissing = true)
    val got = out.df.collect().map(r => (
      Option(r.getString(0)), Option(r.get(1)).map(_.asInstanceOf[Double]),
      r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
      r.getBoolean(4))).toSet
    val expected = Set(
      (Some("k1"), Some(5.0), "1985-01-01", Some("1990-01-01"), false),  // closed pass-through
      (Some("k1"), Some(10.0), "1990-01-01", None, true),                // unchanged
      (Some("k2"), Some(20.0), "1990-01-01", Some("1995-06-01"), false), // changed: closed...
      (Some("k2"), Some(25.0), "1995-06-01", None, true),                // ...and new version
      (Some("k3"), Some(30.0), "1990-01-01", Some("1995-06-01"), false), // missing → closed
      (Some("k4"), Some(44.0), "1995-06-01", None, true),                // brand new
      (Some("k5"), Some(50.0), "1985-01-01", Some("1990-01-01"), false), // old closed version
      (Some("k5"), Some(55.0), "1995-06-01", None, true),                // re-appearing key
      (None, None, "1990-01-01", None, true))                            // null key, null-safe same
    assert(got == expected, s"got $got")
  }

  test("scd2Merge: closeMissing=false keeps absent keys open (partial snapshots)") {
    val (hist, snap) = scdFixture
    val out = Chain(spark, "scd_h2", hist)
      .scd2Merge(Chain(spark, "scd_s2", snap), Seq("k"), Seq("v"), "1995-06-01")
    val k3 = out.df.where("k = 'k3'").collect()
    assert(k3.length == 1 && k3(0).isNullAt(3) && k3(0).getBoolean(4),
      s"k3 must stay open under a partial snapshot, got ${k3.toSeq}")
    assert(out.df.count() == 9)
  }

  test("scd2Merge: rendered SQL face answers exactly like the DataFrame face") {
    val (hist, snap) = scdFixture
    hist.createOrReplaceTempView("scd_h3")
    snap.createOrReplaceTempView("scd_s3")
    for (closeMissing <- Seq(true, false)) {
      val out = Chain(spark, "scd_h3", hist)
        .scd2Merge(Chain(spark, "scd_s3", snap), Seq("k"), Seq("v"),
          "1995-06-01", closeMissing = closeMissing)
      assert(rows(spark.sql(out.sql())) == rows(out.df),
        s"SQL face parity (closeMissing=$closeMissing)")
    }
  }

  test("scd2Merge: ONE scan of each side in the physical plan") {
    val (hist, snap) = scdFixture
    val dir = java.nio.file.Files.createTempDirectory("scd_scan").toString
    hist.write.parquet(s"$dir/h")
    snap.write.parquet(s"$dir/s")
    val out = Chain(spark, "scd_hp", spark.read.parquet(s"$dir/h"))
      .scd2Merge(Chain(spark, "scd_sp", spark.read.parquet(s"$dir/s")),
        Seq("k"), Seq("v"), "1995-06-01", closeMissing = true).df
    out.collect()
    val scans = countScans(out.queryExecution.executedPlan)
    assert(scans == 2,
      s"scd2_merge is one full-outer join: exactly 2 file scans, got $scans")
    graft.core.ScaleLint.assertSafe(out)
  }

  test("scd2Merge: guards — missing columns, non-boolean flag, internal-name collisions") {
    val (hist, snap) = scdFixture
    val h = Chain(spark, "scd_g", hist)
    val s = Chain(spark, "scd_gs", snap)
    intercept[IllegalArgumentException] { // empty keys
      h.scd2Merge(s, Nil, Seq("v"), "1995-06-01")
    }
    intercept[IllegalArgumentException] { // history missing a compare col
      h.scd2Merge(s, Seq("k"), Seq("nope"), "1995-06-01")
    }
    intercept[IllegalArgumentException] { // snapshot missing a compare col
      h.scd2Merge(Chain(spark, "scd_gs2", snap.drop("v")), Seq("k"), Seq("v"), "1995-06-01")
    }
    intercept[IllegalArgumentException] { // is_current must be BOOLEAN
      h.scd2Merge(s, Seq("k"), Seq("v"), "1995-06-01", isCurrent = "v")
    }
    intercept[IllegalArgumentException] { // internal name collision
      Chain(spark, "scd_g2", hist.withColumn("_lp", lit(1)))
        .scd2Merge(s, Seq("k"), Seq("v"), "1995-06-01")
    }
  }

  // ---- hardNegatives: denoised negative mining for contrastive training ---

  private def hnFixture = Seq(
    (1, Seq(1.0f, 0.0f)),      // the query
    (2, Seq(0.9998f, 0.02f)),  // near-dup: cosine ≈ 0.9998 (suspected missing label)
    (3, Seq(1.0f, 1.0f)),      // cosine ≈ 0.7071
    (4, Seq(0.0f, 1.0f)),      // cosine = 0
    (5, Seq(1.0f, 0.0f)))      // the labeled positive (cosine = 1)
    .toDF("vec_id", "embedding")

  test("hardNegatives: positives excluded, threshold denoises, ranks renumber") {
    import graft.ext._
    val corpus = Chain(spark, "hn", hnFixture)
    val q = hnFixture.where("vec_id = 1")
    val pos = Seq((1, 5)).toDF("query_id", "doc_id")
    val noThresh = corpus.hardNegatives(q, pos, "vec_id", "embedding", 3).df
      .orderBy("rank").collect()
    assert(noThresh.map(_.getInt(1)).toSeq == Seq(2, 3, 4),
      "labeled positive 5 excluded; rest ranked by cosine desc")
    val denoised = corpus.hardNegatives(q, pos, "vec_id", "embedding", 3,
      fnThreshold = Some(0.9)).df.orderBy("rank").collect()
    assert(denoised.map(_.getInt(1)).toSeq == Seq(3, 4),
      "near-dup 2 (cosine ≈ 0.9998) dropped by the 0.9 denoising cut")
    assert(denoised.map(_.getInt(3)).toSeq == Seq(1, 2),
      "ranks renumber over the survivors — no gaps where exclusions sat")
    assert(denoised.forall(r =>
      r.getAs[Number](r.fieldIndex("cosine")).doubleValue() < 0.9))
  }

  test("hardNegatives: with no positives and no threshold it IS cosineTopK") {
    import graft.ext._
    val emb = table("embeddings")
    val q = emb.df.where("vec_id < 3")
    val none = Seq.empty[(Long, Long)].toDF("query_id", "doc_id")
    assert(rows(emb.hardNegatives(q, none, "vec_id", "embedding", 5).df) ==
      rows(emb.cosineTopK(q, "vec_id", "embedding", 5).df),
      "empty exclusions must degrade to the exact top-k")
  }

  test("hardNegatives: NaN threshold refuses; non-renderable error names the op") {
    import graft.ext._
    val corpus = Chain(spark, "hn_g", hnFixture)
    val q = hnFixture.where("vec_id = 1")
    val pos = Seq((1, 5)).toDF("query_id", "doc_id")
    intercept[IllegalArgumentException] {
      corpus.hardNegatives(q, pos, "vec_id", "embedding", 3,
        fnThreshold = Some(Double.NaN))
    }
    val e = intercept[UnsupportedOperationException](
      corpus.hardNegatives(q, pos, "vec_id", "embedding", 3).sql())
    assert(e.getMessage.contains("hard_negatives"))
  }
}
