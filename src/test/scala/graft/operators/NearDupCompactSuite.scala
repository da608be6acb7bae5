package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.compute.Compaction

/** r15 (VERDICT r14 #4): the durable near-dup index's APPENDED row
  * tables (sigs/, grams/ — one parquet append per ingest batch) carry
  * the same small-file debt compactIvfPq closed for the PQ index.
  * Pinned here: file-count collapse on both tables, probe equality
  * across the swap, crash kills at every failpoint healing with zero
  * loss, and skip/no-op behavior. */
class NearDupCompactSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("nd-compact-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpusDf = {
    val sp = spark; import sp.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river"),
      (1L, "completely different content about catalyst optimizer internals"),
      (2L, "another unrelated doc on shuffle partitioning and skew"))
      .toDF("doc_id", "text")
  }
  private def batchDf(id: Long): DataFrame = {
    val sp = spark; import sp.implicits._
    Seq((id, s"novel batch document number $id with its own words"))
      .toDF("doc_id", "text")
  }

  /** Fresh saved index over the 3-row corpus + `updates` daily batches. */
  private def staged(updates: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ndcmp").toString
    Dedup.saveNearDupIndex(
      Dedup.buildNearDupIndex(corpusDf, "text", "doc_id", persist = false), dir)
    (0 until updates).foreach(b =>
      Dedup.updateNearDupIndex(spark, dir, batchDf(100L + b), "text"))
    dir
  }

  private def tableFiles(dir: String, table: String): Seq[String] = {
    val d = new java.io.File(s"$dir/$table")
    if (!d.exists()) Nil
    else d.listFiles().toSeq.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName)
  }

  private def probe(dir: String): Set[(Long, Long)] = {
    val sp = spark; import sp.implicits._
    val idx = Dedup.loadNearDupIndex(spark, dir, persist = false)
    val q = Seq(
      (900L, "the quick brown fox jumps over the lazy dog near the river"),
      (901L, "novel batch document number 103 with its own words"))
      .toDF("doc_id", "text")
    Dedup.incrementalJaccardPairs(q, idx, "text",
      minJaccard = 0.9, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("daily appends accumulate files; compact collapses both tables") {
    val dir = staged(updates = 10)
    val sigsBefore = tableFiles(dir, "sigs").size
    val gramsBefore = tableFiles(dir, "grams").size
    assert(sigsBefore >= 11 && gramsBefore >= 11,
      s"appends must accumulate, got sigs=$sigsBefore grams=$gramsBefore")
    val pre = probe(dir)
    assert(pre == Set((900L, 0L), (901L, 103L)), s"fixture sanity: $pre")
    val stats = Dedup.compactNearDupIndex(spark, dir)
    assert(!stats.sigs.skipped && !stats.grams.skipped)
    assert(stats.sigs.filesBefore == sigsBefore &&
      stats.grams.filesBefore == gramsBefore)
    assert(tableFiles(dir, "sigs").size == stats.sigs.filesAfter &&
      stats.sigs.filesAfter <= 2, s"sigs not collapsed: $stats")
    assert(tableFiles(dir, "grams").size == stats.grams.filesAfter &&
      stats.grams.filesAfter <= 2, s"grams not collapsed: $stats")
    assert(probe(dir) == pre, "compaction must not change probe results")
    // already compact -> no-op
    val again = Dedup.compactNearDupIndex(spark, dir)
    assert(again.sigs.skipped && again.grams.skipped)
    // a post-compaction update still folds cleanly
    Dedup.updateNearDupIndex(spark, dir, batchDf(500L), "text")
    val sp = spark; import sp.implicits._
    val q = Seq((902L, "novel batch document number 500 with its own words"))
      .toDF("doc_id", "text")
    val found = Dedup.incrementalJaccardPairs(q,
      Dedup.loadNearDupIndex(spark, dir, persist = false), "text",
      minJaccard = 0.9, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((902L, 500L)))
  }

  test("an update during a claimed compaction is refused loudly (r15)") {
    val dir = staged(updates = 3)
    var refused = ""
    val stats = Dedup.compactNearDupIndex(spark, dir,
      failpoint = l => if (l == "rewritten" && refused.isEmpty) {
        val e = intercept[IllegalStateException] {
          Dedup.updateNearDupIndex(spark, dir, batchDf(700L), "text")
        }
        refused = e.getMessage
      })
    assert(refused.contains("compaction in progress"), refused)
    assert(!stats.sigs.skipped)
    // claim released on completion: the same update now succeeds
    Dedup.updateNearDupIndex(spark, dir, batchDf(700L), "text")
    val sp = spark; import sp.implicits._
    val q = Seq((903L, "novel batch document number 700 with its own words"))
      .toDF("doc_id", "text")
    val found = Dedup.incrementalJaccardPairs(q,
      Dedup.loadNearDupIndex(spark, dir, persist = false), "text",
      minJaccard = 0.9, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((903L, 700L)))
  }

  test("claim race, stale clearing, and exception release (r15)") {
    val dir = staged(updates = 2)
    val claim = new java.io.File(s"$dir/.neardup-compact-claim")
    val w = new java.io.FileWriter(claim)
    try w.write(s"other\t${System.currentTimeMillis()}") finally w.close()
    // fresh claim refuses both a second compactor and an update
    intercept[IllegalStateException] { Dedup.compactNearDupIndex(spark, dir) }
    intercept[IllegalStateException] {
      Dedup.updateNearDupIndex(spark, dir, batchDf(710L), "text")
    }
    // past the TTL the claim is stale and clears
    Thread.sleep(30)
    val stats = Dedup.compactNearDupIndex(spark, dir, claimTtlMs = 10L)
    assert(!stats.sigs.skipped && !claim.exists())
    // a controlled failure releases the claim on the way out (fresh
    // appends first — an already-compact table skips before the seam)
    Dedup.updateNearDupIndex(spark, dir, batchDf(711L), "text")
    Dedup.updateNearDupIndex(spark, dir, batchDf(712L), "text")
    intercept[RuntimeException] {
      Dedup.compactNearDupIndex(spark, dir,
        failpoint = l => if (l == "rewritten") sys.error("boom"))
    }
    assert(!claim.exists(), "exception path must release the claim")
  }

  test("load refuses a fresh-claimed mid-swap table, heals an orphaned one (r15)") {
    val dir = staged(updates = 2)
    val pre = probe(dir)
    // orphan a mid-swap manifest in sigs/ (compactor died, claim gone —
    // the exception path releases it)
    intercept[RuntimeException] {
      Dedup.compactNearDupIndex(spark, dir,
        failpoint = l => if (l == "old-moved") sys.error("boom"))
    }
    assert(new java.io.File(s"$dir/sigs/.compact-manifest").exists())
    // a FRESH claim (live compactor) makes the load refuse loudly
    val claim = new java.io.File(s"$dir/.neardup-compact-claim")
    val w = new java.io.FileWriter(claim)
    try w.write(s"other\t${System.currentTimeMillis()}") finally w.close()
    val e = intercept[IllegalStateException] {
      Dedup.loadNearDupIndex(spark, dir, persist = false)
    }
    assert(e.getMessage.contains("compaction in progress"))
    // claim gone (orphaned swap): load heals and reads committed rows
    assert(claim.delete())
    assert(probe(dir) == pre, "healed load must read the committed files")
    assert(!new java.io.File(s"$dir/sigs/.compact-manifest").exists())
  }

  test("KV variant: collapse, probe equality, loud orphan handling (r15)") {
    val kv = new graft.routing.InMemoryConditionalKv
    val dir = staged(updates = 6)
    val pre = probe(dir)
    val stats = Dedup.compactNearDupIndexKv(spark, dir, kv)
    assert(!stats.sigs.skipped && stats.sigs.filesAfter <= 2 &&
      stats.grams.filesAfter <= 2, s"$stats")
    assert(probe(dir) == pre, "KV compaction must not change probe results")
    assert(kv.list("compact/").isEmpty, "KV manifests must be cleared")
    // update refused while the KV variant holds the claim
    var refused = ""
    Dedup.updateNearDupIndex(spark, dir, batchDf(800L), "text")
    Dedup.compactNearDupIndexKv(spark, dir, kv,
      failpoint = l => if (l == "rewritten" && refused.isEmpty) {
        val e = intercept[IllegalStateException] {
          Dedup.updateNearDupIndex(spark, dir, batchDf(801L), "text")
        }
        refused = e.getMessage
      })
    assert(refused.contains("compaction in progress"), refused)
    // orphaned KV swap (crash mid-swap, claim released by the exception
    // path): a plain-FS load must refuse LOUDLY with the KV heal named —
    // it cannot see the KV manifest, and reading a half-swapped table
    // silently would return duplicate or partial rows
    Dedup.updateNearDupIndex(spark, dir, batchDf(802L), "text")
    intercept[RuntimeException] {
      Dedup.compactNearDupIndexKv(spark, dir, kv,
        failpoint = l => if (l == "old-deleted") sys.error("boom"))
    }
    val e = intercept[IllegalStateException] {
      Dedup.loadNearDupIndex(spark, dir, persist = false)
    }
    assert(e.getMessage.contains("healNearDupIndexKv"), e.getMessage)
    assert(Dedup.healNearDupIndexKv(spark, dir, kv))
    val post = probe(dir)
    assert(post == pre, s"healed KV swap must read committed rows: $post")
  }

  test("a kill at every swap failpoint heals with zero loss") {
    for (fp <- Seq("rewritten", "manifest-written", "old-moved",
      "new-moved", "committed")) {
      val dir = staged(updates = 4)
      val pre = probe(dir)
      intercept[RuntimeException] {
        Compaction.compactDir(spark, s"$dir/sigs", 64L << 20,
          failpoint = l => if (l == fp) sys.error(s"boom at $l"))
      }
      // a manifest exists (and heal acts) only between manifest-written
      // and the commit-point delete; outside that window heal is a
      // clean-work-dirs no-op
      val midSwap = Set("manifest-written", "old-moved", "new-moved")(fp)
      assert(Dedup.healNearDupIndex(spark, dir) == midSwap,
        s"[$fp] unexpected heal outcome")
      val pairs = probe(dir)
      assert(pairs == pre, s"[$fp] probe diverged: $pairs")
      // redo through the public entry point (heals at entry, idempotent)
      val stats = Dedup.compactNearDupIndex(spark, dir)
      assert(stats.sigs.filesAfter <= 2 || stats.sigs.skipped, s"[$fp] $stats")
      assert(probe(dir) == pre, s"[$fp] post-redo probe diverged")
      assert(!new java.io.File(s"$dir/sigs/.compact-manifest").exists() &&
        !new java.io.File(s"$dir/sigs/.compact-tmp").exists() &&
        !new java.io.File(s"$dir/sigs/.compact-old").exists(),
        s"[$fp] work state survived")
    }
  }
}
