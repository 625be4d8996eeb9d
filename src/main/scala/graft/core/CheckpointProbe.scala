package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Eager `localCheckpoint` with aggregate metrics computed BY the
  * materialization job itself (`Dataset.observe`) — the round-17
  * replacement for the probe-after-checkpoint shape every iterative
  * operator paid: convergence sums, node/edge counts and split sizes
  * used to be a SECOND job re-scanning the checkpoint blocks that the
  * materialization pass had just streamed (at corpus scale, a full extra
  * pass over DISK_ONLY blocks per round). The observation's accumulators
  * ride the checkpoint action, so the probe is free.
  *
  * The metric map is read through the observation listener; as a
  * defensive fallback (a listener bus that never delivers would
  * otherwise hang an iterative loop forever), the helper polls briefly
  * and then recomputes the metrics with one bounded aggregate over the
  * materialized blocks — the exact job this helper exists to remove,
  * paid only if the listener path fails.
  */
private[graft] object CheckpointProbe {

  /** Checkpoint `df` eagerly and return (checkpointed frame, metric
    * values in `metrics` order). Aggregate columns only (the
    * `Dataset.observe` contract).
    */
  def apply(df: DataFrame, metrics: (String, Column)*): (DataFrame, Seq[Any]) = {
    require(metrics.nonEmpty, "checkpoint_probe: at least one metric")
    val names = metrics.map(_._1)
    val named = metrics.map { case (n, c) => c.as(n) }
    val obs = new org.apache.spark.sql.Observation()
    val cp = df.observe(obs, named.head, named.tail: _*).localCheckpoint()
    var m = org.apache.spark.sql.GraftBridge.observationResult(obs)
    var waitedMs = 0L
    while (m.isEmpty && waitedMs < 10000L) {
      Thread.sleep(5); waitedMs += 5
      m = org.apache.spark.sql.GraftBridge.observationResult(obs)
    }
    if (m.nonEmpty) (cp, names.map(m(_)))
    else {
      val row = cp.agg(named.head, named.tail: _*).collect()(0)
      (cp, names.indices.map(row.get))
    }
  }
}
