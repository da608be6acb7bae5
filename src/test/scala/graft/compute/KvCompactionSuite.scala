package graft.compute

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.dimension._
import graft.routing.InMemoryConditionalKv
import graft.signal._

/** A local FS that REFUSES rename outside committer scaffolding —
  * the S3-semantics stand-in: object stores have no atomic rename, so
  * the KV-guarded swap must never call it. (Committer renames inside
  * `_temporary` are allowed: on a real object store the REWRITE stage
  * runs under a zero-rename committer; the SWAP is what this variant
  * makes rename-free.) */
class NoRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("norename:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (src.toString.contains("_temporary")) super.rename(src, dst)
    else throw new UnsupportedOperationException(
      s"norename fs: atomic rename not available ($src -> $dst)")
  }
}

/** r14: object-store-safe compaction (VERDICT r13 #3) — copy-then-
  * conditional-manifest through a ConditionalKv, zero renames on the
  * swap path, with roll-FORWARD/roll-BACK healing decided from the
  * manifest's recorded file lengths. Failpoint-killed at every step on
  * a filesystem where rename throws. */
class KvCompactionSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.hadoop.fs.norename.impl",
        classOf[NoRenameFileSystem].getName)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  private def sig(root: String): Signal =
    Signal("n1", SignalSource.internal(root, "n1")
      .copy(attrs = DatasetAttrs(datasetType = DatasetType.APPEND)),
      daySpec, DimFilter.branchOf(daySpec, Seq("2026-08-10")))

  private def tmpRoot(): String =
    "norename://" +
      java.nio.file.Files.createTempDirectory("graft_kvcmp").toString

  private def partFiles(dir: String): Seq[String] = {
    val d = new java.io.File(new java.net.URI(
      dir.replace("norename://", "file://")))
    if (!d.exists()) Nil
    else d.listFiles().toSeq.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName)
  }

  private def appendBatches(s: Signal, batches: Int, wide: Int): Unit =
    (0 until batches).foreach { b =>
      OutputWriter.write(spark,
        spark.range(b * 1000L, b * 1000L + 1000L).toDF("id")
          .repartition(wide), s)
    }

  test("kv compaction runs rename-free end-to-end on the no-rename FS") {
    val root = tmpRoot()
    val s = sig(root)
    appendBatches(s, batches = 2, wide = 25)
    val dir = s"$root/internal_data/n1/2026-08-10"
    val before = partFiles(dir).size
    assert(before >= 40, s"append accumulation expected, got $before")
    val kv = new InMemoryConditionalKv
    val stats = Compaction.compactPartitionKv(spark, s, 64L << 20, kv)
    assert(!stats.skipped && stats.filesBefore == before)
    assert(partFiles(dir).size == stats.filesAfter &&
      stats.filesAfter <= 2)
    val rows = spark.read.parquet(dir).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(rows.toSeq == (0L until 2000L).toSeq)
    assert(kv.list("compact/").isEmpty, "manifest must be cleared")
    // already compact -> no-op
    assert(Compaction.compactPartitionKv(spark, s, 64L << 20, kv).skipped)
  }

  test("crash at every swap step heals with zero data loss (no-rename FS)") {
    for (fp <- Seq("rewritten", "manifest-claimed", "success-removed",
      "new-copied", "claim-verified", "old-deleted", "committed")) {
      val root = tmpRoot()
      val s = sig(root)
      appendBatches(s, batches = 2, wide = 25)
      val dir = s"$root/internal_data/n1/2026-08-10"
      val kv = new InMemoryConditionalKv
      val boom = intercept[RuntimeException] {
        Compaction.compactPartitionKv(spark, s, 64L << 20, kv,
          failpoint = l => if (l == fp) sys.error(s"boom at $l"))
      }
      assert(boom.getMessage.contains(fp))
      // healMinClaimAgeMs = 0: this IS the known-crashed-compactor case
      // the explicit-0 escape hatch exists for (the default TTL would
      // refuse the fresh manifest — see the dedicated pin below)
      val stats = Compaction.compactPartitionKv(spark, s, 64L << 20, kv,
        healMinClaimAgeMs = 0L)
      assert(stats.filesAfter <= 2 || stats.skipped, s"[$fp] $stats")
      val rows = spark.read.parquet(dir).select("id").collect()
        .map(_.getLong(0)).sorted
      assert(rows.toSeq == (0L until 2000L).toSeq, s"[$fp] data diverged")
      assert(partFiles(dir).size <= 2, s"[$fp] not compacted")
      assert(new java.io.File(new java.net.URI(
        s"$root/internal_data/n1/2026-08-10/_SUCCESS"
          .replace("norename://", "file://"))).exists(), s"[$fp] no marker")
      assert(kv.list("compact/").isEmpty, s"[$fp] manifest survived")
      assert(!partFiles(dir).exists(_.startsWith(".")), s"[$fp] work files")
    }
  }

  test("heal rolls BACK before the commit point, FORWARD after it") {
    // crash after _SUCCESS removal, before any copy: old set canonical
    val root1 = tmpRoot()
    val s1 = sig(root1)
    appendBatches(s1, batches = 2, wide = 10)
    val dir1 = s"$root1/internal_data/n1/2026-08-10"
    val before1 = partFiles(dir1).toSet
    val kv1 = new InMemoryConditionalKv
    intercept[RuntimeException] {
      Compaction.compactPartitionKv(spark, s1, 64L << 20, kv1,
        failpoint = l => if (l == "success-removed") sys.error("boom"))
    }
    assert(Compaction.healPartitionKv(spark, s1, kv1))
    assert(partFiles(dir1).toSet == before1,
      "rollback must restore exactly the pre-compaction files")
    assert(!Compaction.healPartitionKv(spark, s1, kv1), "idempotent")

    // crash after all new files are in: commit point passed -> forward
    val root2 = tmpRoot()
    val s2 = sig(root2)
    appendBatches(s2, batches = 2, wide = 10)
    val dir2 = s"$root2/internal_data/n1/2026-08-10"
    val kv2 = new InMemoryConditionalKv
    intercept[RuntimeException] {
      Compaction.compactPartitionKv(spark, s2, 64L << 20, kv2,
        failpoint = l => if (l == "new-copied") sys.error("boom"))
    }
    assert(Compaction.healPartitionKv(spark, s2, kv2))
    assert(partFiles(dir2).size <= 2,
      "roll-forward must finish the compaction, not undo it")
    val rows = spark.read.parquet(dir2).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(rows.toSeq == (0L until 2000L).toSeq)
  }

  test("a partially-copied new file (length mismatch) forces rollback") {
    val root = tmpRoot()
    val s = sig(root)
    appendBatches(s, batches = 2, wide = 10)
    val dir = s"$root/internal_data/n1/2026-08-10"
    val before = partFiles(dir).toSet
    val kv = new InMemoryConditionalKv
    intercept[RuntimeException] {
      Compaction.compactPartitionKv(spark, s, 64L << 20, kv,
        failpoint = l => if (l == "new-copied") sys.error("boom"))
    }
    // simulate a torn local-FS copy: truncate one copied-in new file
    val newName = kv.list("compact/").headOption
      .flatMap(k => kv.get(k)).get.split('\n')
      .collectFirst { case l if l.startsWith("new\t") => l.split('\t')(1) }.get
    val local = new java.io.File(new java.net.URI(
      s"$dir/$newName".replace("norename://", "file://")))
    val ch = new java.io.RandomAccessFile(local, "rw")
    try ch.setLength(math.max(0L, local.length() - 7)) finally ch.close()
    assert(Compaction.healPartitionKv(spark, s, kv))
    assert(partFiles(dir).toSet == before,
      "length mismatch must be read as not-committed -> rollback")
  }

  test("a lost claim is detected BEFORE the old-file delete (r15)") {
    // the ADVICE r14 hazard: compactor B's entry heal rolls a LIVE
    // claimant A back mid-copy (restoring _SUCCESS and dropping A's
    // manifest); A must then ABORT at its destructive step instead of
    // deleting the old files a restored marker presents as committed.
    // Simulated via the failpoint seam: at "new-copied" a rogue actor
    // replaces A's manifest — A must throw and leave every old file.
    val root = tmpRoot()
    val s = sig(root)
    appendBatches(s, batches = 2, wide = 10)
    val dir = s"$root/internal_data/n1/2026-08-10"
    val before = partFiles(dir).toSet
    val kv = new InMemoryConditionalKv
    val e = intercept[java.io.IOException] {
      Compaction.compactPartitionKv(spark, s, 64L << 20, kv,
        failpoint = l => if (l == "new-copied") {
          val key = kv.list("compact/").head
          kv.delete(key)
          assert(kv.putIfNoneMatch(key, "claim\thijacker\t0\nold\tx\t1"))
        })
    }
    assert(e.getMessage.contains("claim lost"), e.getMessage)
    assert(before.subsetOf(partFiles(dir).toSet),
      "aborted compactor must not have deleted any old file")
    // data still fully readable (old files intact; the copied-in new
    // files are a benign superset until the hijacker's swap is healed)
    kv.delete(kv.list("compact/").head)
    assert(spark.read.parquet(before.map(n => s"$dir/$n").toSeq: _*)
      .count() == 2000L)
  }

  test("heal refuses a claim younger than the lease TTL (r15)") {
    val root = tmpRoot()
    val s = sig(root)
    appendBatches(s, batches = 2, wide = 10)
    val kv = new InMemoryConditionalKv
    intercept[RuntimeException] {
      Compaction.compactPartitionKv(spark, s, 64L << 20, kv,
        failpoint = l => if (l == "new-copied") sys.error("boom"))
    }
    // fresh claim + TTL -> refuse (claimant may be live)
    val e = intercept[java.io.IOException] {
      Compaction.healPartitionKv(spark, s, kv, minClaimAgeMs = 60000L)
    }
    assert(e.getMessage.contains("refusing to heal"), e.getMessage)
    // without TTL (explicit operator decision) the heal proceeds
    assert(Compaction.healPartitionKv(spark, s, kv))
  }

  test("GENERIC entry points refuse to entry-heal a fresh claim by " +
    "default (r16 ADVICE)") {
    // a direct caller of compactPartitionKv/compactDirKv — not the index
    // wrappers — must not roll back a LIVE overlapping compactor's fresh
    // manifest: the default healMinClaimAgeMs is the claim TTL, so the
    // entry heal refuses instead of healing, without any explicit arg
    val root = tmpRoot()
    val s = sig(root)
    appendBatches(s, batches = 2, wide = 10)
    val kv = new InMemoryConditionalKv
    intercept[RuntimeException] {
      Compaction.compactPartitionKv(spark, s, 64L << 20, kv,
        failpoint = l => if (l == "new-copied") sys.error("boom"))
    }
    val e = intercept[java.io.IOException] {
      Compaction.compactPartitionKv(spark, s, 64L << 20, kv) // DEFAULTS
    }
    assert(e.getMessage.contains("refusing to heal"), e.getMessage)

    val dir = s"$root/sigs"
    (0 until 6).foreach { b =>
      spark.range(b * 100L, b * 100L + 100L).toDF("id").repartition(3)
        .write.mode("append").parquet(dir)
    }
    val kv2 = new InMemoryConditionalKv
    intercept[RuntimeException] {
      Compaction.compactDirKv(spark, dir, 64L << 20, kv2,
        failpoint = l => if (l == "new-copied") sys.error("boom"))
    }
    val e2 = intercept[java.io.IOException] {
      Compaction.compactDirKv(spark, dir, 64L << 20, kv2) // DEFAULTS
    }
    assert(e2.getMessage.contains("refusing to heal"), e2.getMessage)
    // the explicit-0 escape hatch still heals (operator decision): the
    // new-copied crash is PAST the commit point, so the entry heal rolls
    // forward — dir already compact, manifest cleared, rows intact
    Compaction.compactDirKv(spark, dir, 64L << 20, kv2,
      healMinClaimAgeMs = 0L)
    assert(kv2.list("compact/").isEmpty)
    assert(spark.read.parquet(dir).count() == 600L)
  }

  test("compactDirKv: flat-table swap runs rename-free and kills heal (r15)") {
    // the near-dup index row tables' object-store path: stage a FLAT
    // parquet dir on the no-rename FS, then (a) compact end-to-end and
    // (b) kill at every failpoint — entry heal must roll forward/back
    // to exactly the committed rows, with zero rename calls on the swap
    def stage(): String = {
      val root = tmpRoot()
      val dir = s"$root/sigs"
      (0 until 12).foreach { b =>
        spark.range(b * 100L, b * 100L + 100L).toDF("id").repartition(3)
          .write.mode("append").parquet(dir)
      }
      dir
    }
    def rows(dir: String): Seq[Long] =
      spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
    val want = (0L until 1200L).toSeq

    val d0 = stage()
    val kv0 = new InMemoryConditionalKv
    val stats = Compaction.compactDirKv(spark, d0, 64L << 20, kv0)
    assert(!stats.skipped && stats.filesAfter <= 2 &&
      partFiles(d0).size == stats.filesAfter)
    assert(rows(d0) == want)
    assert(Compaction.compactDirKv(spark, d0, 64L << 20, kv0).skipped)
    assert(kv0.list("compact/").isEmpty)

    for (fp <- Seq("rewritten", "manifest-claimed", "success-removed",
      "new-copied", "claim-verified", "old-deleted", "committed")) {
      val dir = stage()
      val kv = new InMemoryConditionalKv
      intercept[RuntimeException] {
        Compaction.compactDirKv(spark, dir, 64L << 20, kv,
          failpoint = l => if (l == fp) sys.error(s"boom at $l"))
      }
      val redo = Compaction.compactDirKv(spark, dir, 64L << 20, kv,
        healMinClaimAgeMs = 0L)
      assert(redo.filesAfter <= 2 || redo.skipped, s"[$fp] $redo")
      assert(rows(dir) == want, s"[$fp] rows diverged")
      assert(kv.list("compact/").isEmpty, s"[$fp] manifest survived")
      assert(!partFiles(dir).exists(_.startsWith(".")), s"[$fp] work files")
      assert(!new java.io.File(new java.net.URI(
        s"$dir/.compact-kv-inflight".replace("norename://", "file://")))
        .exists(), s"[$fp] inflight marker survived")
    }
  }

  test("a second claimant is refused while a swap manifest exists") {
    val root = tmpRoot()
    val s = sig(root)
    appendBatches(s, batches = 2, wide = 10)
    val kv = new InMemoryConditionalKv
    intercept[RuntimeException] {
      Compaction.compactPartitionKv(spark, s, 64L << 20, kv,
        failpoint = l => if (l == "manifest-claimed") sys.error("boom"))
    }
    // a concurrent compactor that does NOT heal first must be refused
    val e = intercept[java.io.IOException] {
      // bypass the built-in heal by calling with a failpoint that throws
      // BEFORE heal could run is impossible (heal runs first) — so pin
      // the claim itself instead:
      val attrs = s.source.attrs
      val rootP = new org.apache.hadoop.fs.Path(s.materializedPaths.head)
      val dataPath = attrs.dataFolder.map(d =>
        new org.apache.hadoop.fs.Path(rootP, d)).getOrElse(rootP)
      if (!kv.putIfNoneMatch(s"compact/${dataPath.toString}", "claim2"))
        throw new java.io.IOException("swap already claimed")
      ()
    }
    assert(e.getMessage.contains("already claimed"))
  }
}
