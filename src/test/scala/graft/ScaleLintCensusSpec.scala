package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Structural scale census over the ENTIRE driver contract: every
  * `SparkEntry.queries` plan is linted with [[graft.core.ScaleLint]] and
  * the error-level findings are diffed against a committed snapshot
  * (`src/test/resources/scalelint_census.txt`). Rounds 13-15 each found
  * one more instance of the same global-window disease by hand; this spec
  * ends the class — re-introducing an empty-partition window (or any
  * other error-shape) into ANY driver query fails here with the query
  * named, and a NEW deliberate exact face must be whitelisted inline with
  * its reason before it can land.
  *
  * Lint is LAZY (plans are compiled, never executed) but some operators
  * run declared bounded jobs at construction (stats probes, PrefixScan
  * materializations) — the census runs at sf0.001 to keep those cheap.
  */
class ScaleLintCensusSpec extends AnyFunSuite {

  /** Every committed error-level finding carries its documented reason
    * here — the whitelist IS the list of deliberate exact faces. A
    * finding without a reason fails the census even if snapshotted.
    */
  private val whitelist: Map[String, String] = Map(
    // (query|rule) -> why this plan shape is deliberate.
    // (TEN queries fired global-window here when the census first ran,
    // round 16. ALL TEN were then FIXED rather than whitelisted:
    // q_auc / q_spearman / q_quantile_normalize retired their global rank
    // windows onto PrefixScan distinct-value ranks; q_ks_profile /
    // q_gini / q_chi2_homogeneity / q_jsd_profile / q_t_closeness /
    // q_mix_unimax / q_unimax_alloc retired their count-frame global
    // windows onto PrefixScan positions/cumulative counts and
    // one-row-aggregate broadcast totals — "value-domain bounded" and
    // "#strata rows" both go corpus-sized on continuous columns and
    // domain-grain mixes, so those were real. What remains whitelisted is
    // ONLY the declared brute/exact similarity faces.)
    // Declared exact/brute similarity faces (the recall gates' references):
    "q_sim_topk|nested-loop-join" ->
      "the exact brute-force cosine baseline every recall floor measures against",
    "q_sim_topk_hamming|nested-loop-join" ->
      ("sketch pass streams the corpus ONCE against broadcast queries; only " +
        "skinny (id, id, ham) tuples shuffle — the declared sketch-rerank shape"),
    "q_search_pq|nested-loop-join" ->
      "full-scan ADC by definition: every code scored against broadcast queries",
    "q_hard_negatives|nested-loop-join" ->
      ("declared exact mining face: corpus streams once against broadcast " +
        "queries (the cosineTopK family shape), positives excluded by anti-join"),
    "q_search_pq_ivf_rerank|nested-loop-join" ->
      ("stage-1 centroid broadcast (<= nlist rows BY CONSTRUCTION) rides a " +
        "condition-free crossJoin the plan cannot prove bounded on an " +
        "RDD-backed index (Round15Spec documents the shape); shortlist and " +
        "corpus meet in equi-joins")
  )

  test("census: no unwhitelisted error-level ScaleLint findings across the driver contract") {
    val lines = scala.collection.mutable.SortedSet.empty[String]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        graft.core.ScaleLint.lint(df)
          .filter(_.severity == "error")
          .foreach(f => lines += s"$name|${f.rule}")
        // census plans are never executed; free any declared
        // materializations the construction left behind
        graft.core.Chain.releaseCheckpoints(df)
      } catch {
        case e: Throwable => failures += s"$name: ${e.getClass.getSimpleName} ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, s"queries failed to construct:\n${failures.mkString("\n")}")
    val computed = lines.toSeq
    // always emit the computed census for fixture refreshes
    val outDir = java.nio.file.Paths.get("target")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.write(outDir.resolve("scalelint_census_computed.txt"),
      (computed.mkString("\n") + "\n").getBytes("UTF-8"))
    val fixture = java.nio.file.Paths.get("src/test/resources/scalelint_census.txt")
    assert(java.nio.file.Files.exists(fixture),
      "committed census snapshot missing — review " +
        "target/scalelint_census_computed.txt, whitelist each line with a " +
        "reason, and commit it as src/test/resources/scalelint_census.txt")
    val committed = new String(java.nio.file.Files.readAllBytes(fixture), "UTF-8")
      .linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    val fresh = computed.diff(committed)
    val stale = committed.diff(computed)
    assert(fresh.isEmpty,
      s"NEW error-level scale findings (fix the plan or whitelist with a reason):\n${fresh.mkString("\n")}")
    assert(stale.isEmpty,
      s"stale census entries (the plan improved — refresh the snapshot):\n${stale.mkString("\n")}")
    val unexplained = committed.filterNot(whitelist.contains)
    assert(unexplained.isEmpty,
      s"census entries without an inline whitelist reason:\n${unexplained.mkString("\n")}")
  }
}
