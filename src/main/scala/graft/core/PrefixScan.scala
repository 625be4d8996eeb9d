package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed grouped exclusive prefix sums — the scale-safe replacement
  * for `SUM(w) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)`
  * when the partition key has few live values (or none): a window with an
  * empty/low-domain PARTITION BY funnels the whole frame through one sort
  * task per key, which is exactly the single-task bottleneck the engine's
  * own ScaleLint flags as an error. This helper computes the identical
  * prefix sums with Spark's range-partitioned sort plus per-partition
  * offset reconstitution — the `trainTestSplit` zipWithIndex regime
  * (see ops/WindowOps.scala), generalized from row counting to weighted
  * grouped sums:
  *
  *   1. range-sort on (group, orderBy) and `localCheckpoint` once (a
  *      declared materialization, so the offsets job and the final scan
  *      read the same blocks instead of re-sorting per action);
  *   2. one light job collects, per Spark partition, ONLY the boundary
  *      group partial sums (first and last group of the partition — any
  *      group interior to a partition cannot span a boundary, so the
  *      collected state is <= 2 rows per partition no matter how many
  *      groups or rows exist);
  *   3. the driver folds those into a per-partition start offset (O(#parts)
  *      work, broadcast back as a plain array);
  *   4. a partition-local scan emits `offset + running local sum` — no
  *      task ever sees more than its own partition's rows.
  *
  * Row order within a (group, orderBy)-tie is engine-chosen, exactly as it
  * is for the window formulation; callers needing determinism pass a
  * tie-free ordering (the same contract the SQL face has).
  */
private[graft] object PrefixScan {

  /** Appends `outCol` = exclusive prefix sum of `weight` within each
    * distinct `groupCols` tuple (empty = one global group), ordered by
    * `orderBy`. Weights are summed as LONGS (the callers' token counts
    * are integral; integer accumulation is what keeps the prefix sums
    * association-free and engine-exact — callers with fractional weights
    * must quantize deliberately first). Null weights contribute 0 (the
    * `SUM OVER` convention); null group values form their own group (the
    * PARTITION BY convention). Output rows arrive sorted by (groupCols,
    * orderBy); column set is the input's plus `outCol`.
    *
    * Eagerness: the sort materializes (`localCheckpoint`) and the
    * boundary-partials job runs AT CONSTRUCTION — the `trainTestSplit`
    * posture (a declared materialization; render-only flows over a chain
    * containing a PrefixScan-backed op pay it too, since the DataFrame
    * face must exist to chain). Release the blocks with
    * [[Chain.releaseCheckpoints]] when nothing will read the result
    * again — the hook walks RDD dependencies, so the buried checkpoint
    * is found.
    *
    * Storage posture: the checkpoint holds the ENTIRE sorted frame as
    * executor blocks until released. The level is
    * `spark.graft.prefixScan.storageLevel` (default `MEMORY_AND_DISK`;
    * set `DISK_ONLY` for corpus-scale frames so the burst never competes
    * with shuffle/execution memory — blocks stream from local disk at
    * scan speed). `localCheckpoint` is NOT fault-tolerant by design:
    * lineage is truncated, so losing an executor that holds blocks fails
    * the downstream job instead of recomputing (Spark's documented local
    * checkpoint contract). On long multi-hour cluster runs, either
    * schedule the consuming action promptly after construction, or set
    * a replicated level (`MEMORY_AND_DISK_2`) via the same key to
    * survive single-executor loss.
    */
  def exclusivePrefixSum(df: DataFrame, groupCols: Seq[Column],
                         orderBy: Seq[Column], weight: Column,
                         outCol: String): DataFrame =
    exclusivePrefixSums(df, groupCols, orderBy, Seq(weight -> outCol))

  /** UNGROUPED scan that ALSO returns the global weight totals. The
    * boundary-partials fold (step 3) already accumulates exactly these
    * sums when there is no grouping — every partition is one run of the
    * single global group, so the fold's final carry IS Σ weight — yet
    * callers used to pay a SECOND job re-aggregating the materialized
    * checkpoint for n (bin ntile, global tie ranks, value-at-rank,
    * quantile gates): at corpus scale that is a full extra pass over
    * DISK_ONLY blocks. Totals arrive in `weights` order; an empty frame
    * yields zeros (the callers' weights are counts, so 0 ⟺ no rows).
    */
  def exclusivePrefixSumWithTotal(df: DataFrame, orderBy: Seq[Column],
                                  weight: Column,
                                  outCol: String): (DataFrame, Long) = {
    val (out, totals) =
      exclusivePrefixSumsInternal(df, Nil, orderBy, Seq(weight -> outCol))
    (out, totals(0))
  }

  /** Multi-weight variant: one range sort, one boundary job, one scan
    * shared by every `(weight, outCol)` pair — the two-sided-census shape
    * (ksProfile's base/other cumulative counts) without sorting the frame
    * once per weight. Contract identical to [[exclusivePrefixSum]] per
    * pair.
    */
  def exclusivePrefixSums(df: DataFrame, groupCols: Seq[Column],
                          orderBy: Seq[Column],
                          weights: Seq[(Column, String)]): DataFrame =
    exclusivePrefixSumsInternal(df, groupCols, orderBy, weights)._1

  /** Shared body: the scan frame plus the fold's final carry. The carry
    * equals the GLOBAL per-weight totals only when `groupCols` is empty
    * (one global run across all partitions) — grouped callers get the
    * carry of the LAST group, which is why only
    * [[exclusivePrefixSumWithTotal]] exposes it.
    */
  private def exclusivePrefixSumsInternal(
      df: DataFrame, groupCols: Seq[Column], orderBy: Seq[Column],
      weights: Seq[(Column, String)]): (DataFrame, Array[Long]) = {
    require(weights.nonEmpty, "prefix_scan: at least one weight is required")
    val spark = df.sparkSession
    val inCols = df.columns.toSeq
    val gNames = groupCols.indices.map(i => s"_ps_g$i")
    val wNames = weights.indices.map(i => s"_ps_w$i")
    val outCols = weights.map(_._2)
    require(outCols.distinct.size == outCols.size,
      s"prefix_scan: duplicate output columns in ${outCols.mkString(", ")}")
    (gNames ++ wNames ++ outCols).foreach(n => require(!inCols.contains(n),
      s"prefix_scan: internal/output column '$n' already exists on the frame"))
    var tagged = df
    groupCols.zip(gNames).foreach { case (g, n) => tagged = tagged.withColumn(n, g) }
    weights.map(_._1).zip(wNames).foreach { case (w, n) =>
      tagged = tagged.withColumn(n, w.cast("long")) }
    val level = org.apache.spark.storage.StorageLevel.fromString(
      spark.conf.get("spark.graft.prefixScan.storageLevel", "MEMORY_AND_DISK"))
    val sorted = tagged
      .orderBy((gNames.map(col) ++ orderBy): _*)
      .localCheckpoint(true, level)
    val schema = sorted.schema
    val gIdx = gNames.map(schema.fieldIndex).toArray
    val wIdx = wNames.map(schema.fieldIndex).toArray
    val nW = wIdx.length
    // group keys must compare BY VALUE: Row.get returns Array[Byte] for
    // BinaryType (and Java arrays for nested array externals), which Seq
    // equality compares by REFERENCE — every row would start a new group
    // run and the prefix sums would be silently wrong while the SQL
    // window face groups binary by value. Normalize arrays (recursively:
    // array<binary> elements too) to value-comparable Seqs; Rows (struct
    // keys) already value-compare and Arrays.equals their binary fields.
    def normalize(v: Any): Any = v match {
      case b: Array[Byte] => b.toSeq
      case a: Array[_] => a.toSeq.map(normalize)
      case s: Seq[_] => s.map(normalize)
      case other => other
    }
    def keyOf(r: Row): Seq[Any] = gIdx.toSeq.map(i => normalize(r.get(i)))
    def wOf(r: Row, j: Int): Long = {
      val i = wIdx(j); if (r.isNullAt(i)) 0L else r.getLong(i)
    }
    def addInto(acc: Array[Long], r: Row): Unit = {
      var j = 0; while (j < nW) { acc(j) += wOf(r, j); j += 1 }
    }

    // job 2: boundary partials — per partition, the first group's partial
    // sums and (if distinct) the last group's partial sums. The job needs
    // ONLY the group-key and weight columns, so it scans a PROJECTION of
    // the checkpointed frame (a narrow map — partition count and order
    // preserved) instead of converting every full-width row to an
    // external Row (round 17: the conversion cost is per-column, and
    // PrefixScan callers carry whole corpus rows here).
    val narrow = sorted.select((gNames ++ wNames).map(col): _*)
    val nSchema = narrow.schema
    val ngIdx = gNames.map(nSchema.fieldIndex).toArray
    val nwIdx = wNames.map(nSchema.fieldIndex).toArray
    def nKeyOf(r: Row): Seq[Any] = ngIdx.toSeq.map(i => normalize(r.get(i)))
    def nwOf(r: Row, j: Int): Long = {
      val i = nwIdx(j); if (r.isNullAt(i)) 0L else r.getLong(i)
    }
    def nAddInto(acc: Array[Long], r: Row): Unit = {
      var j = 0; while (j < nW) { acc(j) += nwOf(r, j); j += 1 }
    }
    def nWeightsOf(r: Row): Array[Long] = {
      val a = new Array[Long](nW); nAddInto(a, r); a
    }
    val partials: Array[(Int, List[(Seq[Any], Array[Long])])] =
      narrow.rdd.mapPartitionsWithIndex { (pid, it) =>
        var firstKey: Seq[Any] = null
        var firstSum: Array[Long] = null
        var curKey: Seq[Any] = null
        var curSum: Array[Long] = null
        var seen = false
        var firstClosed = false
        it.foreach { row =>
          val k = nKeyOf(row)
          if (!seen) { seen = true; firstKey = k; curKey = k; curSum = nWeightsOf(row) }
          else if (k == curKey) nAddInto(curSum, row)
          else {
            if (!firstClosed) { firstSum = curSum; firstClosed = true }
            curKey = k; curSum = nWeightsOf(row)
          }
        }
        val entries =
          if (!seen) Nil
          else if (!firstClosed) List((firstKey, curSum)) // one group spans the partition
          else List((firstKey, firstSum), (curKey, curSum))
        Iterator.single((pid, entries))
      }.collect()

    // step 3: driver fold — a group's start offsets in partition p are the
    // accumulated trailing-run sums of the SAME group across partitions
    // < p; only the first group of a partition can continue a run
    val nParts = sorted.rdd.getNumPartitions
    val offsets = Array.fill(nParts)(new Array[Long](nW))
    var prevKey: Option[Seq[Any]] = None
    var carry = new Array[Long](nW)
    partials.sortBy(_._1).foreach {
      case (_, Nil) => // empty partition: run state passes through
      case (pid, entries) =>
        val (fk, _) = entries.head
        if (prevKey.contains(fk)) offsets(pid) = carry.clone()
        val (lk, ls) = entries.last
        val base =
          if (entries.size == 1 && prevKey.contains(lk)) carry
          else new Array[Long](nW)
        carry = Array.tabulate(nW)(j => base(j) + ls(j))
        prevKey = Some(lk)
    }
    val offB = spark.sparkContext.broadcast(offsets)

    // step 4: partition-local scan — offset + running local sums
    val outSchema = StructType(schema.fields ++
      outCols.map(n => StructField(n, LongType, nullable = false)))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = offB.value(pid).clone()
      var cur: Seq[Any] = null
      var started = false
      it.map { row =>
        val k = keyOf(row)
        if (started && cur != k) running = new Array[Long](nW)
        started = true
        cur = k
        val before = running.clone()
        addInto(running, row)
        Row.fromSeq(row.toSeq ++ before)
      }
    }
    (spark.createDataFrame(rdd, outSchema)
      .select((inCols ++ outCols).map(col): _*), carry)
  }
}
