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
  * The metric map is read through the observation listener. The wait is
  * BOUNDED (`spark.graft.checkpointProbe.waitMs`, default 2000): an
  * 11-round iterative loop on a listener bus that never delivers must
  * not sleep 10 s per round (round-17 verdict #5) — past the bound the
  * helper recomputes the metrics with one aggregate over the
  * MATERIALIZED blocks (cheap: the exact job this helper exists to
  * remove, paid only when the listener path fails). Spark 4 registers
  * observations with the session-level ObservationManager (one shared
  * listener per session, not one per probe), so an undelivered probe
  * leaks only its map entry, never a listener.
  * `spark.graft.checkpointProbe.forceFallback = true` skips the
  * listener read entirely — the spec's hook for pinning the fallback
  * path.
  */
private[graft] object CheckpointProbe {

  /** Checkpoint `df` eagerly and return (checkpointed frame, metric
    * values in `metrics` order). Aggregate columns only (the
    * `Dataset.observe` contract).
    */
  def apply(df: DataFrame, metrics: (String, Column)*): (DataFrame, Seq[Any]) = {
    require(metrics.nonEmpty, "checkpoint_probe: at least one metric")
    val conf = df.sparkSession.conf
    val names = metrics.map(_._1)
    val named = metrics.map { case (n, c) => c.as(n) }
    val force = conf
      .get("spark.graft.checkpointProbe.forceFallback", "false").toBoolean
    if (force) {
      val cp = df.localCheckpoint()
      return (cp, fallback(cp, named, names.size))
    }
    val waitMs = math.max(0L,
      conf.get("spark.graft.checkpointProbe.waitMs", "2000").toLong)
    val obs = new org.apache.spark.sql.Observation()
    val cp = df.observe(obs, named.head, named.tail: _*).localCheckpoint()
    var m = org.apache.spark.sql.GraftBridge.observationResult(obs)
    var waited = 0L
    while (m.isEmpty && waited < waitMs) {
      Thread.sleep(5); waited += 5
      m = org.apache.spark.sql.GraftBridge.observationResult(obs)
    }
    if (m.nonEmpty) (cp, names.map(m(_)))
    else (cp, fallback(cp, named, names.size))
  }

  /** One bounded aggregate over the materialized checkpoint blocks —
    * the pre-observe probe job, kept as the defensive path.
    */
  private def fallback(cp: DataFrame, named: Seq[Column], n: Int): Seq[Any] = {
    val row = cp.agg(named.head, named.tail: _*).collect()(0)
    (0 until n).map(row.get)
  }
}
