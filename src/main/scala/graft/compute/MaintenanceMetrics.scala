package graft.compute

/** Process-wide counters for index/table MAINTENANCE events (r16,
  * VERDICT r15 #8): compaction swaps, heals, and claim-protocol
  * contention were fully crash-tested machinery with ZERO runtime
  * observability — an operator could not tell a healthy daily loop
  * from one that heals (crashes) every night or spins on claim
  * contention. The routing layer already surfaces its counters as an
  * alarmable metric series (`route.<id>.probeFailures`,
  * Application.platformMetricsDf); this registry gives the
  * compaction/claim layer the same face: every emitter below is a
  * static object (Compaction, FsClaim, Pq), so the registry is
  * per-JVM — the same scope as the SparkSession the maintenance jobs
  * run on — and platformMetricsDf folds a snapshot into its series.
  *
  * Names (all monotone counters; `Double`-valued in the series):
  *  - `maintenance.compaction.swaps` — completed non-skipped rewrites
  *  - `maintenance.compaction.skipped` — already-compact no-ops
  *  - `maintenance.compaction.filesCollapsed` — Σ (before − after)
  *  - `maintenance.compaction.bytesRewritten` — Σ input bytes
  *  - `maintenance.compaction.wallMs` — Σ rewrite+swap wall time
  *  - `maintenance.heal.rolledForward` / `.rolledBack` — interrupted
  *    swaps finished / undone at entry or on load
  *  - `maintenance.claim.contention` — fresh-claim refusals + lost
  *    acquire races + post-acquire verify aborts (an alarm on rate >
  *    0 says maintenance windows overlap)
  *  - `maintenance.claim.staleCleared` — dead-claimant TTL clears (an
  *    alarm here says compactions are CRASHING, not merely slow)
  *  - `maintenance.claim.heartbeatOwnershipLost` — heartbeats that
  *    stopped because the claim vanished or turned foreign
  */
object MaintenanceMetrics {

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()

  private[graft] def add(name: String, delta: Long = 1L): Unit = {
    counters.computeIfAbsent(name,
      _ => new java.util.concurrent.atomic.AtomicLong)
      .addAndGet(delta)
    ()
  }

  /** Counter snapshot, series-shaped. Absent = zero (never emitted). */
  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) => k -> v.get().toDouble }.toMap
  }

  /** Test seam: zero every counter (per-JVM registry; suites that pin
    * exact deltas reset first and assert with >= elsewhere). */
  def reset(): Unit = counters.clear()
}
