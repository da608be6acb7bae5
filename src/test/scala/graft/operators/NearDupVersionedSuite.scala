package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r15: the rename-free VERSIONED bucket layout (`buckets_v<N>/` dirs
  * committed by immutable `buckets_ptr.vN` pointer files) — the last
  * rename-dependent step of the daily near-dup maintenance loop, gone.
  * Pinned here: the ENTIRE loop (save -> update xN -> probe ->
  * compactNearDupIndexKv -> update again) on a filesystem where rename
  * THROWS outside committer scaffolding; update==rebuild equality;
  * crash windows (orphan merge dir before the pointer, torn pointer
  * file) falling back to the committed version; version GC. */
class NearDupVersionedSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("nd-versioned-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.hadoop.fs.norename.impl",
        classOf[graft.compute.NoRenameFileSystem].getName)
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

  private def localDirOf(uri: String): java.io.File =
    new java.io.File(new java.net.URI(
      uri.replace("norename://", "file://")))

  private def pairsOf(idx: Dedup.NearDupIndex,
                      probe: DataFrame): Set[(Long, Long)] =
    Dedup.incrementalJaccardPairs(probe, idx, "text",
      minJaccard = 0.9, maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("the whole maintenance loop runs with zero non-committer renames") {
    val dir = "norename://" +
      java.nio.file.Files.createTempDirectory("graft_ndv").toString
    val built = Dedup.buildNearDupIndex(corpusDf, "text", "doc_id",
      persist = false)
    Dedup.saveNearDupIndex(built, dir, renameFree = true)
    (0 until 4).foreach(b =>
      Dedup.updateNearDupIndex(spark, dir, batchDf(100L + b), "text"))

    val sp = spark; import sp.implicits._
    val probe = Seq(
      (900L, "the quick brown fox jumps over the lazy dog near the river"),
      (901L, "novel batch document number 102 with its own words"))
      .toDF("doc_id", "text")
    val updated = Dedup.loadNearDupIndex(spark, dir, persist = false)
    val rebuilt = Dedup.buildNearDupIndex(
      corpusDf.unionByName((0 until 4).map(b => batchDf(100L + b))
        .reduce(_ unionByName _)),
      "text", "doc_id", persist = false)
    assert(pairsOf(updated, probe) == pairsOf(rebuilt, probe))
    assert(pairsOf(updated, probe) == Set((900L, 0L), (901L, 102L)))

    // GC keeps current + previous only
    val names = localDirOf(dir).listFiles().map(_.getName).toSet
    assert(names.contains("buckets_ptr.v5") && names.contains("buckets_v5"))
    assert(!names.exists(n => n.startsWith("buckets_ptr.v") &&
      n.stripPrefix("buckets_ptr.v").toInt < 4), s"stale pointers: $names")
    assert(!names.exists(n => n.matches("buckets_v[0-3]")),
      s"stale version dirs: $names")

    // the rename-free sigs/grams compaction composes on the same store
    val stats = Dedup.compactNearDupIndexKv(spark, dir,
      new graft.routing.InMemoryConditionalKv)
    assert(!stats.sigs.skipped && stats.sigs.filesAfter <= 2)
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe) == Set((900L, 0L), (901L, 102L)))

    // and a post-compaction update still folds cleanly, rename-free
    Dedup.updateNearDupIndex(spark, dir, batchDf(500L), "text")
    val probe2 = Seq(
      (902L, "novel batch document number 500 with its own words"))
      .toDF("doc_id", "text")
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe2) == Set((902L, 500L)))
  }

  test("crash windows: orphan merge dir and torn pointer fall back safely") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ndv2").toString
    Dedup.saveNearDupIndex(
      Dedup.buildNearDupIndex(corpusDf, "text", "doc_id", persist = false),
      dir, renameFree = true)
    Dedup.updateNearDupIndex(spark, dir, batchDf(100L), "text")
    val sp = spark; import sp.implicits._
    val probe = Seq(
      (900L, "novel batch document number 100 with its own words"))
      .toDF("doc_id", "text")
    val committed = pairsOf(
      Dedup.loadNearDupIndex(spark, dir, persist = false), probe)
    assert(committed == Set((900L, 100L)))

    // window 1: a crash AFTER the merge write, BEFORE the pointer PUT —
    // the orphan dir must be invisible (previous version stays live)
    spark.range(1).toDF("junk").write.mode("overwrite")
      .parquet(s"$dir/buckets_v3")
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe) == committed, "orphan (pointer-less) dir must be ignored")
    // a retried update overwrites the orphan and commits past it
    Dedup.updateNearDupIndex(spark, dir, batchDf(101L), "text")
    val probe101 = Seq(
      (901L, "novel batch document number 101 with its own words"))
      .toDF("doc_id", "text")
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe101) == Set((901L, 101L)))

    // window 2: a TORN pointer (crash mid-PUT on a local FS) with the
    // highest seq — readers must skip it and resolve the previous one
    val torn = new java.io.FileWriter(s"$dir/buckets_ptr.v9")
    try torn.write("") finally torn.close()
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe101) == Set((901L, 101L)), "torn pointer must fall back")
    // a pointer to a dir that never finished (no _SUCCESS) is also skipped
    val bad = new java.io.FileWriter(s"$dir/buckets_ptr.v8")
    try bad.write("buckets_v999") finally bad.close()
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe101) == Set((901L, 101L)), "targetless pointer must fall back")
  }

  test("a fresh save clears a previously-advanced versioned layout (r15)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ndv4").toString
    Dedup.saveNearDupIndex(
      Dedup.buildNearDupIndex(corpusDf, "text", "doc_id", persist = false),
      dir, renameFree = true)
    (0 until 3).foreach(b =>
      Dedup.updateNearDupIndex(spark, dir, batchDf(100L + b), "text"))
    assert(new java.io.File(s"$dir/buckets_ptr.v4").exists())
    // the documented failed-update recovery: REBUILD from the raw
    // corpus. A legacy-layout re-save must not leave the old v4 pointer
    // resolving stale buckets against the fresh row tables.
    Dedup.saveNearDupIndex(
      Dedup.buildNearDupIndex(corpusDf, "text", "doc_id", persist = false),
      dir) // default legacy layout
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.exists(_.startsWith("buckets_ptr.")) &&
      names.contains("buckets"), s"versioned residue after legacy save: $names")
    val sp = spark; import sp.implicits._
    val probe = Seq(
      (900L, "the quick brown fox jumps over the lazy dog near the river"),
      (901L, "novel batch document number 100 with its own words"))
      .toDF("doc_id", "text")
    // the rebuilt index holds ONLY the corpus: batch doc 100 must not
    // match anything (a stale v4 bucket table would still pair it)
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe) == Set((900L, 0L)))
    // and a versioned re-save onto the same path starts clean at v1
    Dedup.saveNearDupIndex(
      Dedup.buildNearDupIndex(corpusDf, "text", "doc_id", persist = false),
      dir, renameFree = true)
    val names2 = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names2.contains("buckets_ptr.v1") && !names2.contains("buckets") &&
      !names2.exists(n => n.startsWith("buckets_ptr.v") &&
        n.stripPrefix("buckets_ptr.v").toInt > 1), s"$names2")
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe) == Set((900L, 0L)))
  }

  test("legacy (rename-swap) indexes are untouched by the new layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ndv3").toString
    Dedup.saveNearDupIndex(
      Dedup.buildNearDupIndex(corpusDf, "text", "doc_id", persist = false),
      dir) // default layout
    Dedup.updateNearDupIndex(spark, dir, batchDf(100L), "text")
    assert(new java.io.File(s"$dir/buckets").exists(),
      "legacy live dir must stay the committed table")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("buckets_ptr.")),
      "no pointer files may appear in legacy mode")
    val sp = spark; import sp.implicits._
    val probe = Seq(
      (900L, "novel batch document number 100 with its own words"))
      .toDF("doc_id", "text")
    assert(pairsOf(Dedup.loadNearDupIndex(spark, dir, persist = false),
      probe) == Set((900L, 100L)))
  }
}
