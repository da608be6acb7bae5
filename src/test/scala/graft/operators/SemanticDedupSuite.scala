package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Guard-behavior verification for SemDeDup-style semantic dedup — the
  * paths the DuckDB oracle (p21) cannot see: the degenerate-clustering
  * throw, the partial-drop warn path, semanticK's derivation bounds, and
  * semanticCellStats' row shape.
  *
  * Determinism note: buildIvfIndex seeds k-means with the k lowest-md5(id)
  * rows. Test ids are chosen so the seed set spans both planted directions
  * (md5 order over "0".."11" starts 6, 9, 11, 7 — so id 6 carries
  * direction A and ids 9/11 direction B, making the seeds {A, B}).
  */
class SemanticDedupSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("semantic-dedup-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Two orthogonal directions; parallel vectors (differing scales)
    * normalize to the same unit vector, so k-means cannot separate them. */
  private def twoClusterDf = {
    val sp = spark; import sp.implicits._
    val dirA = Seq(1f, 0f, 0f, 0f)
    val dirB = Seq(0f, 1f, 0f, 0f)
    val bIds = Set(9L, 11L) // two of the three lowest md5(id) — seeds hit B
    (0L to 11L).map { i =>
      val d = if (bIds(i)) dirB else dirA
      (i, d.map(_ * (i + 1)))
    }.toDF("vec_id", "embedding")
  }

  test("semanticDedupDrops: parallel rows drop with min-id keeper at cosine 1") {
    // derived-k path (k <= 0): semanticK(12, 10000) clamps to 16 > rows,
    // so every distinct unit vector seeds its own cell
    val drops = Dedup.semanticDedupDrops(twoClusterDf, "embedding", "vec_id",
      minCosine = 0.95).collect()
    val aIds = (0L to 11L).filterNot(Set(9L, 11L))
    // direction A: min id 0 survives, the other 9 drop with keeper 0
    // direction B: 9 survives, 11 drops with keeper 9
    assert(drops.length == 10)
    val byDropped = drops.map(r => r.getAs[Long]("dropped") ->
      (r.getAs[Long]("keeper"), r.getAs[Double]("cosine"))).toMap
    aIds.drop(1).foreach { id =>
      assert(byDropped(id)._1 == 0L, s"keeper of $id")
      assert(math.abs(byDropped(id)._2 - 1.0) < 1e-9)
    }
    assert(byDropped(11L)._1 == 9L)
    assert(!byDropped.contains(0L) && !byDropped.contains(9L))
  }

  test("semanticDedupDrops: partial over-cap cells are skipped with a warn, not a throw") {
    // k=2 → cell A holds 10 rows (> cap 3, dropped), cell B holds 2 (kept)
    val drops = Dedup.semanticDedupDrops(twoClusterDf, "embedding", "vec_id",
      minCosine = 0.95, k = 2, iters = 2, maxCellSize = 3).collect()
    assert(drops.length == 1)
    assert(drops.head.getAs[Long]("dropped") == 11L)
    assert(drops.head.getAs[Long]("keeper") == 9L)
  }

  test("semanticDedupDrops: throws when EVERY candidate cell exceeds the cap") {
    val sp = spark; import sp.implicits._
    val allParallel = (0L to 7L).map(i => (i, Seq(1f, 0f).map(_ * (i + 1))))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      Dedup.semanticDedupDrops(allParallel, "embedding", "vec_id",
        minCosine = 0.95, k = 2, iters = 1, maxCellSize = 3)
    }
    assert(e.getMessage.contains("maxCellSize"))
    assert(e.getMessage.contains("semanticCellStats"))
  }

  test("semanticK: clamps to [16, 65536], targets ~maxCellSize/2 expected fill") {
    assert(Dedup.semanticK(0L, 10000) == 16)
    assert(Dedup.semanticK(1000L, 10000) == 16)
    assert(Dedup.semanticK(100000L, 10000) == 20)   // ceil(2n/cap)
    assert(Dedup.semanticK(1600000L, 100000) == 32) // the r5 failure shape
    assert(Dedup.semanticK(1000000000L, 10000) == 65536)
  }

  test("semanticCellStats: one row with the documented shape and counts") {
    val rows = Dedup.semanticCellStats(twoClusterDf, "embedding", "vec_id",
      k = 2, iters = 2, maxCellSize = 3).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("k") == 2)
    assert(r.getAs[Long]("cells") == 2L)
    assert(r.getAs[Long]("max_cell") == 10L)
    assert(r.getAs[Long]("multi_cells") == 2L)
    assert(r.getAs[Long]("dropped_cells") == 1L)
    assert(r.getAs[Long]("pairs_avoided") == 45L) // 10*9/2
  }
}
