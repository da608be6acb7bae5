package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Checkpoint-storage policy for data-scale intermediates.
  *
  * The r19 sf100 bench proved the failure mode this object exists to
  * prevent: `localCheckpoint()`'s DEFAULT storage is memory-first
  * DESERIALIZED, and its block unroll materializes each partition as ONE
  * in-heap object array. At 600M-row lineitem (q35's events table is 3n
  * rows) 32 concurrent ~1.2 GB unrolls starved the unified memory pool
  * and killed the downstream sort with UNABLE_TO_ACQUIRE_MEMORY +
  * GCLocker thrash — twice, at 32 AND 256 shuffle partitions.
  *
  * Policy (r20, re-proved r21): any checkpointed intermediate
  * PROPORTIONAL to the operator's input — exploded token/gram tables
  * (larger than the corpus text), per-doc signature/label/cell tables
  * (narrow but O(n) rows), tf/vocabulary aggregates (unbounded at web
  * scale) — goes through [[diskCheckpoint]], pinned to `DISK_ONLY`.
  *
  * MEMORY_AND_DISK_SER was TRIED AND MEASURED WORSE (r21, VERDICT r20
  * next #1 — a negative result, kept here so it is not re-tried): the
  * hypothesis was that serialized memory storage would reclaim a
  * presumed DISK_ONLY read round-trip while keeping the incremental
  * unroll + mid-unroll disk bail-out that survives the r19 sf100 kill
  * shape. Both levels were A/B'd on the same rig, same day, calm
  * windows, identical canary: q35 at sf100 (450M-row events checkpoint)
  * 577.8 s SER vs 375.5 s DISK_ONLY (1.54x), at 100x min-of-3 58.8 s
  * SER vs 26.8 s DISK_ONLY. Mechanism, from the artifacts' own
  * telemetry: SER blocks live ON-HEAP and thrash GC (gc 2.6–6.6 s per
  * sweep vs 0.06–0.3 s) while competing with the unified execution
  * pool; DISK_ONLY's blocks ride the OS PAGE CACHE (iowait ~0 in every
  * sweep), i.e. its "disk round-trip" is already a memory read with
  * zero heap cost, and at sf100 — where the blocks exceed storage
  * memory — SER additionally pays unroll-then-evict churn for blocks
  * that end on disk anyway. `SPARK_GRAFT_CKPT_LEVEL` keeps both sides
  * re-runnable (and lets a deployment with heap to spare and genuinely
  * slow local disks choose SER deliberately).
  *
  * The memory-first DESERIALIZED default remains appropriate ONLY for
  * intermediates with a bound independent of input size (micro-batch
  * tables inside foreachBatch, bounded bucket collects, centroid/scale
  * tables) — each such site documents why it is deliberately
  * memory-eligible.
  *
  * Why localCheckpoint at all (vs persist): checkpoint blocks are
  * reclaimed by the ContextCleaner when the DataFrame is GC'd (persist
  * entries live for the session unless hand-unpersisted, and
  * CacheManager dedupes by plan — repeated calls would silently share
  * entries), and the eager cut severs iterative lineage. The blocks are
  * NOT fault-tolerant — on a preemptible cluster a lost executor fails
  * later reads instead of recomputing; long-lived artifacts should be
  * WRITTEN OUT (saveNearDupIndex / saveAnnIndex / saveIvfPq).
  */
object Ckpt {

  /** Storage level for data-proportional checkpoints; see the object doc
    * for why the default is DISK_ONLY (and for the measured negative
    * result on MEMORY_AND_DISK_SER). */
  private[operators] val level: StorageLevel =
    StorageLevel.fromString(
      sys.env.getOrElse("SPARK_GRAFT_CKPT_LEVEL", "DISK_ONLY"))

  implicit final class DiskCheckpoint(private val df: DataFrame)
      extends AnyVal {
    /** Eager localCheckpoint pinned to the Ckpt policy level (DISK_ONLY)
      * — use for every intermediate proportional to the input (see the
      * object doc for the policy, the sf100 post-mortems, and the
      * measured A/B behind the level choice). */
    def diskCheckpoint(): DataFrame =
      df.localCheckpoint(true, level)
  }
}
