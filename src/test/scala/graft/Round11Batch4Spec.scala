package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.streaming.EventStreams
import TestSpark._

/** Gates for the round-11 analytics-census batch: inter-annotator
  * agreement (Cohen's kappa — label QC for double-scored corpora),
  * ordered-step funnel conversion (sequential greedy semantics, the one
  * a per-user sorted scan would produce), and the day-cohort retention
  * grid. All three close with exact integer counts and single guarded
  * double divisions, so every assertion here is equality, never
  * tolerance.
  */
class Round11Batch4Spec extends AnyFunSuite {
  import spark.implicits._

  // ---- agreement_profile ------------------------------------------------

  test("agreement_profile: hand-verified kappa, marginals, null exclusion") {
    // 10 valid rows: raters agree on 6 (4 x/x, 2 y/y), disagree on 4;
    // a null in either column drops the row entirely
    val df = Seq(
      ("x", "x"), ("x", "x"), ("x", "x"), ("x", "x"),
      ("y", "y"), ("y", "y"),
      ("x", "y"), ("x", "y"), ("y", "x"), ("z", "x"),
      (null, "x"), ("x", null)).toDF("a", "b")
    val out = Chain(spark, "agree0", df).agreementProfile("a", "b")
    val got = out.df.collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("x", "y", "z"))
    assert(got("x").getLong(1) == 6 && got("x").getLong(2) == 6 &&
      got("x").getLong(3) == 4, "x: n_a=6, n_b=6, n_agree=4")
    assert(got("y").getLong(1) == 3 && got("y").getLong(2) == 4 &&
      got("y").getLong(3) == 2, "y: n_a=3, n_b=4, n_agree=2")
    assert(got("z").getLong(1) == 1 && got("z").getLong(2) == 0 &&
      got("z").getLong(3) == 0, "one-sided class carries zero marginals")
    val po = 6.0 / 10.0
    // pe terms quantized at 1e-12 before the exact sum
    def q(t: Double) = math.floor(t * 1e12 + 0.5)
    val pe = (q((6.0 / 10) * (6.0 / 10)) + q((3.0 / 10) * (4.0 / 10)) +
      q((1.0 / 10) * 0.0)) / 1e12
    val want = (po - pe) / (1.0 - pe)
    assert(got("x").getDouble(4) == po && got("x").getDouble(5) == pe)
    assert(got("x").getDouble(6) == want, s"kappa ${got("x").getDouble(6)} vs $want")
    assert(got.values.map(_.getDouble(6)).toSet.size == 1, "kappa repeats per row")
    df.createOrReplaceTempView("agree0")
    assert(rows(spark.sql(out.sql())) == rows(out.df), "SQL face diverged")
    out.assertScaleSafe()
  }

  test("agreement_profile: pe = 1 (both raters constant) yields null kappa, not a divide") {
    val df = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val out = Chain(spark, "agree1", df).agreementProfile("a", "b").df.collect()
    assert(out.length == 1 && out(0).getDouble(4) == 1.0 && out(0).getDouble(5) == 1.0)
    assert(out(0).isNullAt(6), "degenerate pe = 1 must surface null kappa")
  }

  test("agreement_profile grouped: per-segment kappa, degenerate group reads null") {
    // segment g1: perfect agreement on two classes -> kappa 1; segment
    // g2: both raters constant -> pe = 1 -> null kappa
    val df = Seq(
      ("g1", "x", "x"), ("g1", "x", "x"), ("g1", "y", "y"),
      ("g2", "z", "z"), ("g2", "z", "z")).toDF("g", "a", "b")
    val out = Chain(spark, "agreeg", df).agreementProfile("a", "b", groupBy = Seq("g"))
    val got = out.df.collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == Set(("g1", "x"), ("g1", "y"), ("g2", "z")))
    assert(got(("g1", "x")).getDouble(7) == 1.0, "perfect two-class agreement: kappa 1")
    assert(got(("g1", "x")).getLong(8) == 3L, "per-group n")
    assert(got(("g2", "z")).isNullAt(7), "constant raters: pe = 1 -> null kappa")
    df.createOrReplaceTempView("agreeg")
    assert(rows(spark.sql(out.sql())) == rows(out.df), "grouped SQL face diverged")
    out.assertScaleSafe()
  }

  test("cohort_retention fuzz: matches a brute-force per-user reference") {
    val rnd = new scala.util.Random(77)
    val day = 24 * 60L
    val evs = (1 to 300).map { i =>
      evt(i.toLong, rnd.nextInt(20) * day + rnd.nextInt(1440).toLong,
        rnd.nextInt(25).toLong, "e")
    }
    // brute force from (user, day) pairs
    val days = evs.map(e => (e.user_id, (e.ts / 1000000000L - 1704067200L) / 86400L)).distinct
    val cohorts = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = days.groupBy { case (u, d) => (cohorts(u), (d - cohorts(u)).toInt) }
      .view.mapValues(_.size.toLong).toMap
    val got = EventStreams.cohortRetention(evs.toDF()).collect()
      .map { r =>
        val cohortDay = r.getDate(0).toLocalDate.toEpochDay - 19723L // 2024-01-01
        ((cohortDay, r.getInt(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))
      }.toMap
    assert(got.size == cells.size, s"${got.size} cells vs brute ${cells.size}")
    cells.foreach { case (k, n) =>
      val base0 = cells((k._1, 0))
      assert(got(k) == ((n, base0, n.toDouble / base0)), s"cell $k")
    }
  }

  test("grouped profiles fail loudly on reserved-name group columns") {
    val df = Seq(("x", "y", 0.5, 1)).toDF("label", "b", "score", "n")
    val e1 = intercept[IllegalArgumentException] {
      Chain(spark, "rg1", df).agreementProfile("b", "score", groupBy = Seq("label"))
    }
    assert(e1.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException] {
      Chain(spark, "rg2", df).calibrationProfile("score", "n", groupBy = Seq("n"))
    }
    assert(e2.getMessage.contains("collide"))
  }

  test("agreement_profile: empty/all-null input yields an empty frame") {
    val df = Seq((null: String, null: String)).toDF("a", "b")
    assert(Chain(spark, "agree2", df).agreementProfile("a", "b").df.isEmpty)
  }

  // ---- funnel_profile ---------------------------------------------------

  private val base = 1704067200L * 1000000000L
  private def evt(id: Long, minute: Long, user: Long, tpe: String) =
    Evt(id, base + minute * 60L * 1000000000L, user, tpe, 1.0, "{}")

  test("funnel_profile: sequential greedy order, not marginal mins") {
    // user 1: A(t0) -> B(t1) -> C(t2): full conversion
    // user 2: B(t0) -> A(t1) -> B(t2): B-before-A does NOT count, the
    //         re-occurrence after A DOES -> reaches step 2, not step 3
    // user 3: A only -> step 1
    // user 4: B, C only (never A) -> not in the funnel at all
    val df = Seq(
      evt(1, 0, 1, "A"), evt(2, 10, 1, "B"), evt(3, 20, 1, "C"),
      evt(4, 0, 2, "B"), evt(5, 10, 2, "A"), evt(6, 20, 2, "B"),
      evt(7, 0, 3, "A"),
      evt(8, 0, 4, "B"), evt(9, 10, 4, "C")).toDF()
    val got = EventStreams.funnelProfile(df, "event_type", Seq("A", "B", "C"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1) == (("A", 3L, 1.0)))
    assert(got(2) == (("B", 2L, 2.0 / 3.0)), s"got ${got(2)}")
    assert(got(3) == (("C", 1L, 1.0 / 3.0)))
  }

  test("funnel_profile: strictly-after semantics — a tie does not advance") {
    // B at exactly t(A) is not "after" A
    val df = Seq(evt(1, 5, 1, "A"), evt(2, 5, 1, "B")).toDF()
    val got = EventStreams.funnelProfile(df, "event_type", Seq("A", "B"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got(1) == 1L && got(2) == 0L)
  }

  test("funnel_profile within: conversions past the deadline don't count") {
    val day = 24 * 60L
    // user 1: B 10 min after A (in window), C 2 days after A (PAST it)
    // user 2: B 2 days after A (past) -> step 1 only
    // user 3: full chain inside the day
    val df = Seq(
      evt(1, 0, 1, "A"), evt(2, 10, 1, "B"), evt(3, 2 * day, 1, "C"),
      evt(4, 0, 2, "A"), evt(5, 2 * day, 2, "B"),
      evt(6, 0, 3, "A"), evt(7, 5, 3, "B"), evt(8, 10, 3, "C")).toDF()
    val got = EventStreams.funnelProfile(df, "event_type", Seq("A", "B", "C"),
      within = Some("1 DAY"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L), s"got $got")
    // unbounded face on the same data reaches further
    val unbounded = EventStreams.funnelProfile(df, "event_type", Seq("A", "B", "C"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(unbounded == Map(1 -> 3L, 2 -> 3L, 3 -> 2L), s"got $unbounded")
  }

  test("funnel_latency: inclusive-rank seconds over completing users only") {
    // completions A->B: user 1 in 10 min, user 2 in 30 min, user 3 in
    // 60 min; user 4 never reaches B. p50 = rank>=1.5 -> 1800 s;
    // p95 = rank>=2.85 -> 3600 s; n = 3 (user 4 excluded)
    val df = Seq(
      evt(1, 0, 1, "A"), evt(2, 10, 1, "B"),
      evt(3, 0, 2, "A"), evt(4, 30, 2, "B"),
      evt(5, 0, 3, "A"), evt(6, 60, 3, "B"),
      evt(7, 0, 4, "A")).toDF()
    val got = EventStreams.funnelLatency(df, "event_type", Seq("A", "B"),
      Seq(0.5, 0.95)).collect()
      .map(r => r.getDouble(2) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(got == Map(0.5 -> ((1800.0, 3L)), 0.95 -> ((3600.0, 3L))), s"got $got")
    // nobody past step 1 -> no rows, not null rows
    val none = Seq(evt(1, 0, 1, "A")).toDF()
    assert(EventStreams.funnelLatency(none, "event_type", Seq("A", "B"),
      Seq(0.5)).isEmpty)
  }

  test("funnel_profile: nobody enters -> zero counts and null rates, no divide") {
    val df = Seq(evt(1, 0, 1, "Z")).toDF()
    val got = EventStreams.funnelProfile(df, "event_type", Seq("A", "B"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(1).getLong(2) == 0L && got(1).isNullAt(3))
    assert(got(2).getLong(2) == 0L && got(2).isNullAt(3))
  }

  // ---- cohort_retention ---------------------------------------------------

  test("cohort_retention: hand-verified grid, per-day dedup, day-0 = 1.0") {
    val day = 24 * 60L
    // users 1,2 first active day 0; user 1 returns day 1 (twice — must
    // dedup) and day 3; user 2 never returns; user 3 starts day 1 and
    // returns day 2
    val df = Seq(
      evt(1, 0, 1, "A"), evt(2, day + 1, 1, "A"), evt(3, day + 2, 1, "A"),
      evt(4, 3 * day, 1, "A"),
      evt(5, 10, 2, "A"),
      evt(6, day, 3, "A"), evt(7, 2 * day, 3, "A")).toDF()
    val got = EventStreams.cohortRetention(df).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("2024-01-01", 0)) == ((2L, 2L, 1.0)))
    assert(got(("2024-01-01", 1)) == ((1L, 2L, 0.5)), "day+1 deduped to one active user")
    assert(got(("2024-01-01", 3)) == ((1L, 2L, 0.5)))
    assert(!got.contains(("2024-01-01", 2)), "no activity -> no cell, not a zero row")
    assert(got(("2024-01-02", 0)) == ((1L, 1L, 1.0)))
    assert(got(("2024-01-02", 1)) == ((1L, 1L, 1.0)))
    assert(got.size == 5)
  }

  test("funnel_profile fuzz: matches a brute-force per-user greedy scan") {
    // seeded random event soup; the reference implementation literally
    // sorts each user's events and walks the greedy chain — the window
    // formulation must agree on every count
    val rnd = new scala.util.Random(1234)
    val steps = Seq("A", "B", "C")
    val all = Seq("A", "B", "C", "X", "Y")
    val evs = (1 to 400).map { i =>
      evt(i.toLong, rnd.nextInt(500).toLong, rnd.nextInt(40).toLong,
        all(rnd.nextInt(all.length)))
    }
    // brute force: per user, sorted by (ts, then the insertion order Spark
    // can't see — make ts collisions impossible by construction instead)
    val dedupTs = evs.groupBy(e => (e.user_id, e.ts)).map(_._2.head).toSeq
    val byUser = dedupTs.groupBy(_.user_id).view.mapValues(_.sortBy(_.ts))
    val reached = Array.fill(steps.length)(0L)
    byUser.foreach { case (_, es) =>
      var k = 0
      var last = Long.MinValue
      es.foreach { e =>
        if (k < steps.length && e.event_type == steps(k) &&
          (k == 0 || e.ts > last)) { last = e.ts; k += 1; reached(k - 1) += 1 }
      }
    }
    val got = EventStreams.funnelProfile(dedupTs.toDF(), "event_type", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    steps.indices.foreach { i =>
      assert(got(i + 1) == reached(i),
        s"step ${i + 1}: window chain ${got(i + 1)} vs brute force ${reached(i)}")
    }
  }

  test("cohort_retention weekly: per-user-anchored 7-day periods, per-period dedup") {
    val day = 24 * 60L
    // user 1 first active day 0, returns day 3 (same week — dedups into
    // period 0) and day 8 (period 1); user 2 first active day 1, returns
    // day 9 (8 days later -> period 1 anchored at THEIR day 1)
    val df = Seq(
      evt(1, 0, 1, "e"), evt(2, 3 * day, 1, "e"), evt(3, 8 * day, 1, "e"),
      evt(4, day, 2, "e"), evt(5, 9 * day, 2, "e")).toDF()
    val got = EventStreams.cohortRetention(df, periodDays = 7).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    assert(got == Map(
      ("2024-01-01", 0) -> ((1L, 1.0)), ("2024-01-01", 1) -> ((1L, 1.0)),
      ("2024-01-02", 0) -> ((1L, 1.0)), ("2024-01-02", 1) -> ((1L, 1.0))), s"got $got")
  }

  test("funnel + cohort scale shape: bounded builds, no global window") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    graft.core.ScaleLint.assertSafe(
      EventStreams.funnelProfile(ev, "event_type", Seq("signup", "click", "purchase")))
    graft.core.ScaleLint.assertSafe(
      EventStreams.funnelProfile(ev, "event_type", Seq("signup", "click", "purchase"),
        within = Some("1 DAY")))
    graft.core.ScaleLint.assertSafe(EventStreams.cohortRetention(ev))
    graft.core.ScaleLint.assertSafe(EventStreams.cohortRetention(ev, periodDays = 7))
  }
}
