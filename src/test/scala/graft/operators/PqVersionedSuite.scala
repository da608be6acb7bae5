package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r15: the versioned rename-free IVF-PQ cells layout (`cells_v<N>/` +
  * `cells_ptr.vN` pointer commits). Pinned: the whole index loop
  * (save -> update xN -> probe -> compact (+dedup) -> update) on a
  * filesystem where rename THROWS outside committer scaffolding; probe
  * stability across compactions; crash-before-pointer falling back to
  * the committed tree; GC retention; legacy-layout non-interference
  * (PqCompactSuite covers legacy exhaustively). */
class PqVersionedSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("pq-versioned-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.hadoop.fs.norename.impl",
        classOf[graft.compute.NoRenameFileSystem].getName)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

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
    ids.map(id => (id, d.toSeq.map(_ * (id % 5 + 1))))
      .toDF("vec_id", "embedding")
  }

  private def buildVersioned(onNoRename: Boolean): String = {
    val df = corpusDf
    val index = Similarity.buildIvfIndex(df, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val base = java.nio.file.Files.createTempDirectory("graft_pqv").toString
    val dir = if (onNoRename) s"norename://$base" else base
    Pq.saveIvfPq(Pq.encodeCells(index, cb), index.centroids, cb, dir,
      renameFree = true)
    dir
  }

  private def probe(path: String, q: Seq[Float], k: Int): Seq[(Long, Double)] = {
    val (cells, cents, cb) = Pq.loadIvfPq(spark, path)
    Pq.ivfPqTopK(cells, cents, cb, "vec_id", q, k, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }
  private val q1 = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)

  private def localNames(dir: String): Set[String] = {
    val f =
      if (dir.startsWith("norename://"))
        new java.io.File(new java.net.URI(
          dir.replace("norename://", "file://")))
      else new java.io.File(dir)
    f.listFiles().map(_.getName).toSet
  }

  test("the whole index loop runs with zero non-committer renames") {
    val path = buildVersioned(onNoRename = true)
    (0 until 6).foreach { b =>
      Pq.updateIvfPq(spark, path,
        batchDf(Seq(1000L + 2 * b, 1001L + 2 * b), dir = b % 4),
        "embedding", "vec_id")
    }
    val preProbe = probe(path, q1, 12)
    val stats = Pq.compactIvfPq(spark, path)
    assert(!stats.skipped && stats.filesAfter <= 4, s"$stats")
    assert(probe(path, q1, 12) == preProbe,
      "versioned compaction must not change probe results")
    // commit advanced the pointer; GC keeps current + previous only
    val names = localNames(path)
    assert(names.contains("cells_ptr.v2") && names.contains("cells_v2"))
    assert(names.contains("cells_v1"), "previous version is the fallback")
    // dedup pass (replayed batch) also rename-free
    val batch = batchDf(Seq(500L), dir = 1)
    Pq.updateIvfPq(spark, path, batch, "embedding", "vec_id")
    Pq.updateIvfPq(spark, path, batch, "embedding", "vec_id") // replay
    val dd = Pq.compactIvfPq(spark, path, dedupById = Some("vec_id"))
    assert(dd.dedupedRows == 1L, s"$dd")
    val names2 = localNames(path)
    assert(names2.contains("cells_ptr.v3") &&
      !names2.contains("cells_v1") && !names2.contains("cells_ptr.v1"),
      s"GC must drop v1 once v3 commits: $names2")
    // post-compaction update still folds, rename-free
    Pq.updateIvfPq(spark, path, batchDf(Seq(600L), dir = 1),
      "embedding", "vec_id")
    val hits = probe(path, q1, 16).map(_._1)
    assert(hits.contains(500L) && hits.contains(600L), s"got $hits")
  }

  test("crash before the pointer PUT leaves the committed tree live") {
    val path = buildVersioned(onNoRename = false)
    Pq.updateIvfPq(spark, path, batchDf(Seq(900L, 901L), dir = 1),
      "embedding", "vec_id")
    val pre = probe(path, q1, 12)
    // kill between the rewrite and the commit: the new tree is orphaned
    intercept[RuntimeException] {
      Pq.compactIvfPq(spark, path,
        failpoint = l => if (l == "rewritten") sys.error("boom"))
    }
    assert(probe(path, q1, 12) == pre,
      "reader must still resolve the committed version")
    // retry overwrites the orphan and commits past it
    val stats = Pq.compactIvfPq(spark, path)
    assert(!stats.skipped && probe(path, q1, 12) == pre)
    // cells rows intact
    val (cells, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells.count() == 22L)
  }

  test("a compaction claiming DURING an append fails the update loudly (r15)") {
    val path = buildVersioned(onNoRename = false)
    val claimPath = s"$path/.ivfpq-compact-claim"
    val sp = spark; import sp.implicits._
    // poison UDF: the claim file appears WHILE the append job runs —
    // the exact window where a compactor's read misses these rows
    val poison = org.apache.spark.sql.functions.udf((id: Long) => {
      new java.io.File(claimPath).createNewFile(); id
    })
    val batch = batchDf(Seq(700L, 701L), dir = 1)
      .withColumn("vec_id", poison(col("vec_id")))
    val e = intercept[IllegalStateException] {
      Pq.updateIvfPq(spark, path, batch, "embedding", "vec_id")
    }
    assert(e.getMessage.contains("DURING this append"), e.getMessage)
    assert(new java.io.File(claimPath).delete())
    // the documented recovery: re-run the update once the claim clears
    Pq.updateIvfPq(spark, path, batchDf(Seq(700L, 701L), dir = 1),
      "embedding", "vec_id")
    assert(probe(path, q1, 16).map(_._1).contains(700L))
  }

  test("a fresh save clears a previously-advanced versioned layout (r15)") {
    val path = buildVersioned(onNoRename = false)
    (0 until 3).foreach(b => Pq.updateIvfPq(spark, path,
      batchDf(Seq(800L + b), dir = 1), "embedding", "vec_id"))
    Pq.compactIvfPq(spark, path) // pointer advances past v1
    assert(localNames(path).exists(_.startsWith("cells_ptr.v2")))
    // FULL REBUILD onto the same path, versioned: must not collide with
    // (or lose to) the surviving higher-seq pointer
    val df = corpusDf
    val index = Similarity.buildIvfIndex(df, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    Pq.saveIvfPq(Pq.encodeCells(index, cb), index.centroids, cb, path,
      renameFree = true)
    val (cells, _, _) = Pq.loadIvfPq(spark, path)
    assert(cells.count() == 20L, "fresh save must be the resolved table")
    val names = localNames(path)
    assert(names.contains("cells_ptr.v1") &&
      !names.exists(n => n.startsWith("cells_ptr.v") &&
        n.stripPrefix("cells_ptr.v").toInt > 1), s"stale pointers: $names")
    // ... and a LEGACY re-save onto the versioned path wins too
    Pq.saveIvfPq(Pq.encodeCells(index, cb), index.centroids, cb, path)
    val names2 = localNames(path)
    assert(names2.contains("cells") &&
      !names2.exists(_.startsWith("cells_ptr.")), s"versioned residue: $names2")
    assert(Pq.loadIvfPq(spark, path)._1.count() == 20L)
  }

  test("versioned probes keep partition pruning on the resolved dir") {
    val path = buildVersioned(onNoRename = false)
    val (cells, cents, cb) = Pq.loadIvfPq(spark, path)
    val plan = Pq.ivfPqTopK(cells, cents, cb, "vec_id", q1, 5, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("__cell"),
      s"__cell pruning must survive the versioned layout:\n$plan")
  }
}
