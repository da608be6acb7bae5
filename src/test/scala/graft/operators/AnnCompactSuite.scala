package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r15: the durable hyperplane-LSH index's append debt — updateAnnIndex
  * parquet-appends per batch like the near-dup row tables, so it gets
  * the same claim-guarded compaction (FS swap + rename-free KV swap).
  * Pinned: file collapse, probe equality across both swaps, refused
  * updates under a claim, kill-heal, and safe loads. */
class AnnCompactSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("ann-compact-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rnd = new scala.util.Random(7)

  private def staged(updates: Int): (String, DataFrame) = {
    val sp = spark; import sp.implicits._
    val r = rnd
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(16)(r.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_anncmp").toString
    Similarity.saveAnnIndex(
      Similarity.buildIndex(corpus, "embedding", "vec_id", planes = 4,
        persist = false), dir)
    (0 until updates).foreach { b =>
      val batch = (100L + 2 * b until 102L + 2 * b).map(i =>
        (i, Seq.fill(16)(r.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
      Similarity.updateAnnIndex(spark, dir, batch)
    }
    // lshTopKJoin renames the query id column (same name as the index
    // idCol) to query_id in its output
    val queries = (900L until 903L).map(i =>
      (i, Seq.fill(16)(r.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    (dir, queries)
  }

  private def probe(dir: String, queries: DataFrame): Seq[(Long, Long, Int)] =
    Similarity.lshTopKJoin(queries,
      Similarity.loadAnnIndex(spark, dir, persist = false),
      k = 3, probeBits = 2, broadcastQueries = true)
      .select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._3)).toSeq

  private def sigFiles(dir: String): Int =
    new java.io.File(s"$dir/sigs").listFiles().count(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("appends accumulate; FS and KV compactions probe identically") {
    val (dir, queries) = staged(updates = 8)
    val before = sigFiles(dir)
    assert(before >= 9, s"appends must accumulate, got $before")
    val pre = probe(dir, queries)
    assert(pre.nonEmpty)
    val stats = Similarity.compactAnnIndex(spark, dir)
    assert(!stats.skipped && stats.filesBefore == before &&
      stats.filesAfter <= 2)
    assert(probe(dir, queries) == pre, "FS compaction changed probes")
    // more appends, then the rename-free KV variant
    val sp = spark; import sp.implicits._
    val r = rnd
    (0 until 4).foreach { b =>
      Similarity.updateAnnIndex(spark, dir, (200L + b until 201L + b).map(i =>
        (i, Seq.fill(16)(r.nextFloat() * 2 - 1))).toDF("vec_id", "embedding"))
    }
    val pre2 = probe(dir, queries)
    val kv = new graft.routing.InMemoryConditionalKv
    val stats2 = Similarity.compactAnnIndexKv(spark, dir, kv)
    assert(!stats2.skipped && stats2.filesAfter <= 2)
    assert(probe(dir, queries) == pre2, "KV compaction changed probes")
    assert(kv.list("compact/").isEmpty)
  }

  test("update refused under a claim; kill-heal; safe loads") {
    val (dir, queries) = staged(updates = 3)
    val sp = spark; import sp.implicits._
    val batch = Seq((500L, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    var refused = ""
    Similarity.compactAnnIndex(spark, dir,
      failpoint = l => if (l == "rewritten") {
        val e = intercept[IllegalStateException] {
          Similarity.updateAnnIndex(spark, dir, batch)
        }
        refused = e.getMessage
      })
    assert(refused.contains("compaction in progress"), refused)
    Similarity.updateAnnIndex(spark, dir, batch) // claim released

    // FS kill mid-swap: load heals (no claim left — exception released it)
    val pre = probe(dir, queries)
    intercept[RuntimeException] {
      Similarity.compactAnnIndex(spark, dir,
        failpoint = l => if (l == "old-moved") sys.error("boom"))
    }
    assert(probe(dir, queries) == pre, "load must heal the orphaned FS swap")

    // KV kill mid-swap: plain-FS load refuses with the KV heal named
    val kv = new graft.routing.InMemoryConditionalKv
    intercept[RuntimeException] {
      Similarity.compactAnnIndexKv(spark, dir, kv,
        failpoint = l => if (l == "old-deleted") sys.error("boom"))
    }
    val e = intercept[IllegalStateException] {
      Similarity.loadAnnIndex(spark, dir, persist = false)
    }
    assert(e.getMessage.contains("healAnnIndexKv"), e.getMessage)
    assert(Similarity.healAnnIndexKv(spark, dir, kv))
    assert(probe(dir, queries) == pre, "healed KV swap must probe clean")
  }
}
