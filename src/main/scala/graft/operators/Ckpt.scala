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
  * Policy (r20: DISK_ONLY repo-wide; r21: MEMORY_AND_DISK_SER): any
  * checkpointed intermediate PROPORTIONAL to the operator's input —
  * exploded token/gram tables (larger than the corpus text), per-doc
  * signature/label/cell tables (narrow but O(n) rows), tf/vocabulary
  * aggregates (unbounded at web scale) — goes through [[diskCheckpoint]].
  *
  * Why MEMORY_AND_DISK_SER and not DISK_ONLY (r21, VERDICT r20 next #1):
  * DISK_ONLY made every downstream read a disk round-trip even when the
  * blocks fit comfortably in storage memory — at 100x, q35's 45M-row
  * events checkpoint paid ~43% of the query in serde+disk. SERIALIZED
  * memory storage keeps the exact safety property that killed the
  * deserialized default: `putIteratorAsBytes` unrolls INCREMENTALLY into
  * chunked byte buffers (no single per-partition array), bails out to
  * disk mid-unroll when storage memory runs short, and under later
  * memory pressure blocks EVICT to disk (never vanish — eviction of a
  * checkpoint block would otherwise fail the read outright, since
  * checkpoint blocks are not recomputable). Worst case it degrades to
  * exactly DISK_ONLY behavior; best case the round-trip is a memory
  * read. Re-proved at sf100 (450M-row events checkpoint, r21): q35
  * completes, no UNABLE_TO_ACQUIRE_MEMORY — see OPTIMIZATION_r21.md.
  * `SPARK_GRAFT_CKPT_LEVEL` overrides (e.g. DISK_ONLY) for A/B and for
  * deployments whose storage-memory budget is committed elsewhere.
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
    * for why the default is serialized memory with disk spill. */
  private[operators] val level: StorageLevel =
    StorageLevel.fromString(
      sys.env.getOrElse("SPARK_GRAFT_CKPT_LEVEL", "MEMORY_AND_DISK_SER"))

  implicit final class DiskCheckpoint(private val df: DataFrame)
      extends AnyVal {
    /** Eager localCheckpoint pinned to spill-capable SERIALIZED storage —
      * use for every intermediate proportional to the input (see the
      * object doc for the policy and the sf100 post-mortems). */
    def diskCheckpoint(): DataFrame =
      df.localCheckpoint(true, level)
  }
}
