package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r14: IVF-PQ index maintenance (VERDICT r13 #4). `updateIvfPq`
  * appends ≥1 file into up-to-k cell partitions per batch, so a
  * daily-update index accumulates small files without bound;
  * `compactIvfPq` is the whole-index rewrite that clears the debt and
  * (optionally) drops replayed-batch duplicate ids. Pinned here:
  * file-count collapse, probe-result equality across the swap, the
  * dedup-by-id contract, crash kills at every failpoint healing with
  * zero loss, and skip/no-op behavior.
  */
class PqCompactSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("pq-compact-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Four orthogonal unit directions in 8-dim space (the PqSuite
    * fixture: pinned md5-lowest seed ids 6/19/9/11 span the four
    * clusters, so k=4 training separates them exactly). */
  private val dirOf: Map[Long, Int] = {
    val pinned = Map(6L -> 0, 19L -> 1, 9L -> 2, 11L -> 3)
    val rest = (0L until 20L).filterNot(pinned.contains)
    pinned ++ rest.zipWithIndex.map { case (id, ix) => id -> (ix % 4) }.toMap
  }
  private def corpusDf = {
    val sp = spark; import sp.implicits._
    val dirs = Seq(
      Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    (0L until 20L).map { i =>
      val d = dirs(dirOf(i))
      (i, d.map(_ * (i / 4 + 1)))
    }.toDF("vec_id", "embedding")
  }

  private def batchDf(ids: Seq[Long], dir: Int): DataFrame = {
    val sp = spark; import sp.implicits._
    val d = Array.fill(8)(0f); d(dir) = 1f
    ids.map(id => (id, d.toSeq.map(_ * (id % 5 + 1)))).toDF("vec_id", "embedding")
  }

  /** Fresh saved index over the 20-row corpus; returns its path. */
  private def buildIndex(): String = {
    val df = corpusDf
    val index = Similarity.buildIvfIndex(df, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqcmp").toString
    Pq.saveIvfPq(Pq.encodeCells(index, cb), index.centroids, cb, dir)
    dir
  }

  private def cellFiles(path: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (!f.exists()) Nil
      else f.listFiles().toSeq
        .filterNot(c => c.getName.startsWith(".") ||
          (c.getName.startsWith("_") && !c.getName.contains("=")))
        .flatMap(c => if (c.isDirectory) walk(c) else Seq(c))
    walk(new java.io.File(s"$path/cells"))
  }

  private def probe(path: String, q: Seq[Float], k: Int): Seq[(Long, Double)] = {
    val (cells, cents, cb) = Pq.loadIvfPq(spark, path)
    Pq.ivfPqTopK(cells, cents, cb, "vec_id", q, k, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  private val q1 = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)

  test("updates accumulate files; compact collapses them and probes identically") {
    val path = buildIndex()
    (0 until 10).foreach { b =>
      Pq.updateIvfPq(spark, path,
        batchDf(Seq(1000L + 2 * b, 1001L + 2 * b), dir = b % 4),
        "embedding", "vec_id")
    }
    val before = cellFiles(path).size
    assert(before >= 11, s"10 appends must accumulate files, got $before")
    val preProbe = probe(path, q1, 12)
    val stats = Pq.compactIvfPq(spark, path)
    assert(!stats.skipped && stats.filesBefore == before)
    assert(stats.filesAfter <= 4, s"expected ≤1 file/cell, got $stats")
    assert(cellFiles(path).size == stats.filesAfter)
    assert(stats.rows == 40L && stats.dedupedRows == 0L)
    assert(probe(path, q1, 12) == preProbe,
      "compaction must not change probe results")
    // already compact -> skip (no dedup requested)
    assert(Pq.compactIvfPq(spark, path).skipped)
  }

  test("dedupById drops replayed-batch duplicates; without it they persist") {
    val path = buildIndex()
    val batch = batchDf(Seq(500L, 501L, 502L), dir = 1)
    Pq.updateIvfPq(spark, path, batch, "embedding", "vec_id")
    Pq.updateIvfPq(spark, path, batch, "embedding", "vec_id") // replay
    val (cells0, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells0.count() == 26L, "replay duplicates rows (documented)")
    // plain compact keeps them (it is a file rewrite, not a semantic one)
    val plain = Pq.compactIvfPq(spark, path)
    assert(plain.rows == 26L && plain.dedupedRows == 0L)
    // dedup pass clears them — and runs even on an already-compact tree
    val stats = Pq.compactIvfPq(spark, path, dedupById = Some("vec_id"))
    assert(!stats.skipped && stats.dedupedRows == 3L && stats.rows == 23L)
    val (cells, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells.count() == 23L &&
      cells.groupBy("vec_id").count().where(col("count") > 1).count() == 0L)
    val hits = probe(path, q1, 12).map(_._1)
    assert(Seq(500L, 501L, 502L).forall(hits.contains), s"got $hits")
  }

  test("a kill at every swap failpoint heals with zero loss") {
    for (fp <- Seq("rewritten", "manifest-written", "old-moved",
      "new-moved", "committed")) {
      val path = buildIndex()
      (0 until 4).foreach { b =>
        Pq.updateIvfPq(spark, path,
          batchDf(Seq(2000L + b), dir = b % 4), "embedding", "vec_id")
      }
      val preProbe = probe(path, q1, 10)
      intercept[RuntimeException] {
        Pq.compactIvfPq(spark, path,
          failpoint = l => if (l == fp) sys.error(s"boom at $l"))
      }
      // heal + redo through the public entry point
      val stats = Pq.compactIvfPq(spark, path)
      assert(stats.filesAfter <= 4 || stats.skipped, s"[$fp] $stats")
      val (cells, _, _) = Pq.loadIvfPq(spark, path)
      assert(cells.count() == 24L, s"[$fp] rows diverged")
      assert(probe(path, q1, 10) == preProbe, s"[$fp] probe diverged")
      assert(!new java.io.File(s"$path/.ivfpq-compact-manifest").exists() &&
        !new java.io.File(s"$path/.ivfpq-compact-tmp").exists() &&
        !new java.io.File(s"$path/.ivfpq-compact-old").exists(),
        s"[$fp] work state survived")
    }
  }

  test("an update during a claimed compaction is refused loudly (r15)") {
    val path = buildIndex()
    (0 until 3).foreach { b =>
      Pq.updateIvfPq(spark, path, batchDf(Seq(3000L + b), dir = b % 4),
        "embedding", "vec_id")
    }
    // mid-compaction (claim held, rewrite done, swap not yet started):
    // the concurrent update must throw, NOT silently lose its batch
    var refused = ""
    val stats = Pq.compactIvfPq(spark, path,
      failpoint = l => if (l == "rewritten") {
        val e = intercept[IllegalStateException] {
          Pq.updateIvfPq(spark, path, batchDf(Seq(9000L), dir = 0),
            "embedding", "vec_id")
        }
        refused = e.getMessage
      })
    assert(refused.contains("compaction in progress"), refused)
    assert(!stats.skipped)
    // claim released on completion: the same update now succeeds
    Pq.updateIvfPq(spark, path, batchDf(Seq(9000L), dir = 0),
      "embedding", "vec_id")
    val (cells, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells.where(col("vec_id") === 9000L).count() == 1L)
  }

  test("second compactor loses the claim race; stale claims clear (r15)") {
    val path = buildIndex()
    Pq.updateIvfPq(spark, path, batchDf(Seq(800L, 801L), dir = 1),
      "embedding", "vec_id")
    // a fresh claim (another live compactor) refuses both entrants
    val claim = new java.io.File(s"$path/.ivfpq-compact-claim")
    val w = new java.io.FileWriter(claim)
    try w.write(s"other\t${System.currentTimeMillis()}") finally w.close()
    intercept[IllegalStateException] { Pq.compactIvfPq(spark, path) }
    intercept[IllegalStateException] {
      Pq.updateIvfPq(spark, path, batchDf(Seq(802L), dir = 1),
        "embedding", "vec_id")
    }
    // past the TTL the claim is STALE (claimant died) and clears
    Thread.sleep(30)
    val stats = Pq.compactIvfPq(spark, path, claimTtlMs = 10L)
    assert(!stats.skipped && !claim.exists())
    // a controlled failure releases the claim on the way out
    intercept[RuntimeException] {
      Pq.compactIvfPq(spark, path, dedupById = Some("vec_id"),
        failpoint = l => if (l == "rewritten") sys.error("boom"))
    }
    assert(!claim.exists(), "exception path must release the claim")
  }

  test("loadIvfPq refuses an index with an interrupted swap manifest (r15)") {
    val path = buildIndex()
    intercept[RuntimeException] {
      Pq.compactIvfPq(spark, path, dedupById = Some("vec_id"),
        failpoint = l => if (l == "old-moved") sys.error("boom"))
    }
    val e = intercept[IllegalStateException] { Pq.loadIvfPq(spark, path) }
    assert(e.getMessage.contains("interrupted compaction swap"))
    assert(Pq.healIvfPq(spark, path))
    val (cells, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells.count() == 20L)
  }

  test("legacy layout: a full compaction INSIDE the append window fails " +
      "the update loudly (r16)") {
    val path = buildIndex()
    Pq.updateIvfPq(spark, path, batchDf(Seq(700L), dir = 2),
      "embedding", "vec_id")
    // a compaction that claims, swaps the whole tree, and RELEASES all
    // within the append window leaves no claim and (legacy layout) no
    // version seq to compare — only the pre-append file fingerprint can
    // prove the appended batch was dropped by the rewrite
    val e = intercept[IllegalStateException] {
      Pq.updateIvfPq(spark, path, batchDf(Seq(9100L), dir = 1),
        "embedding", "vec_id",
        failpoint = l => if (l == "appended") {
          val st = Pq.compactIvfPq(spark, path, dedupById = Some("vec_id"))
          assert(!st.skipped)
        })
    }
    assert(e.getMessage.contains("DURING this append"), e.getMessage)
    // in THIS interleaving the rewrite happened to read the tree AFTER
    // the append landed, so nothing was lost — the guard cannot know
    // that (a rewrite that listed files a moment earlier WOULD have
    // dropped the batch) and fails conservatively. The documented
    // contract is at-least-once: re-run the update, then dedupById
    // clears whatever the race duplicated.
    Pq.updateIvfPq(spark, path, batchDf(Seq(9100L), dir = 1),
      "embedding", "vec_id")
    Pq.compactIvfPq(spark, path, dedupById = Some("vec_id"))
    val (cells2, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells2.where(col("vec_id") === 9100L).count() == 1L)
  }

  test("healIvfPq is a no-op without a manifest and idempotent with one") {
    val path = buildIndex()
    assert(!Pq.healIvfPq(spark, path))
    intercept[RuntimeException] {
      Pq.compactIvfPq(spark, path, dedupById = Some("vec_id"),
        failpoint = l => if (l == "old-moved") sys.error("boom"))
    }
    assert(Pq.healIvfPq(spark, path), "manifest present -> heal acts")
    assert(!Pq.healIvfPq(spark, path), "second heal is a no-op")
    val (cells, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells.count() == 20L)
  }
}
