package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Checkpoint-storage policy for data-scale intermediates.
  *
  * The r19 sf100 bench proved the failure mode this object exists to
  * prevent: `localCheckpoint()`'s DEFAULT storage is memory-first, and
  * its block unroll materializes each partition as ONE in-heap array.
  * At 600M-row lineitem (q35's events table is 3n rows) 32 concurrent
  * ~1.2 GB unrolls starved the unified memory pool and killed the
  * downstream sort with UNABLE_TO_ACQUIRE_MEMORY + GCLocker thrash —
  * twice, at 32 AND 256 shuffle partitions.
  *
  * Policy (r20, applied repo-wide): any checkpointed intermediate
  * PROPORTIONAL to the operator's input — exploded token/gram tables
  * (larger than the corpus text), per-doc signature/label/cell tables
  * (narrow but O(n) rows: 64-long minhash sigs at 600M docs are 300 GB,
  * exactly the kill shape again), tf/vocabulary aggregates (unbounded at
  * web scale) — goes through [[diskCheckpoint]], which pins the blocks
  * to `DISK_ONLY`. DISK_ONLY streams blocks through serialization (no
  * unroll), costs nothing measurable at small SF (r19 measured), and at
  * 100 TB turns a hard OOM into sequential local-disk I/O. The
  * memory-first default remains appropriate ONLY for intermediates with
  * a bound independent of input size (micro-batch tables inside
  * foreachBatch, bounded bucket collects, centroid/scale tables) — each
  * such site documents why it is deliberately memory-eligible.
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

  implicit final class DiskCheckpoint(private val df: DataFrame)
      extends AnyVal {
    /** Eager localCheckpoint pinned to spill-friendly DISK_ONLY storage —
      * use for every intermediate proportional to the input (see the
      * object doc for the policy and the sf100 post-mortem). */
    def diskCheckpoint(): DataFrame =
      df.localCheckpoint(true, StorageLevel.DISK_ONLY)
  }
}
