package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Product-quantization behavior the DuckDB oracle (p38) cannot see:
  * determinism of training, exactness of ADC when vectors coincide with
  * centroids, the NULL contracts (ragged vectors, cross-codebook codes),
  * codebook save/load round-trips, the IVF-PQ composition, and the plan
  * shape (encode is one narrow pass — broadcast join only, no shuffle).
  */
class PqSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("pq-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Four orthogonal unit directions in 8-dim space; ids replicate each
    * direction at several scales (colinear rows must share a code).
    *
    * Determinism note (the SemanticDedupSuite convention): k-means seeds
    * are the k lowest-md5(id) rows — for ids "0".."19" that is 6, 19, 9,
    * 11 — so those four ids are PINNED to the four distinct directions,
    * guaranteeing the k=4 seed set spans every cluster and Lloyd
    * separates them exactly. */
  private val dirOf: Map[Long, Int] = {
    val pinned = Map(6L -> 0, 19L -> 1, 9L -> 2, 11L -> 3)
    val rest = (0L until 20L).filterNot(pinned.contains)
    pinned ++ rest.zipWithIndex.map { case (id, ix) => id -> (ix % 4) }.toMap
  }
  private def idsOfDir(d: Int): Seq[Long] =
    (0L until 20L).filter(dirOf(_) == d)

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

  test("train is deterministic and encode collapses colinear rows to one code") {
    val df = corpusDf
    val cb1 = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val cb2 = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    assert(cb1.dim == 8 && cb1.m == 2 && cb1.k == 4)
    assert(cb1.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.centroids.map(_.map(_.toSeq).toSeq).toSeq,
      "same data + params must train bit-identical codebooks")

    val codes = Pq.encode(df, "embedding", cb1).collect()
    val byDir = codes.groupBy(r => dirOf(r.getAs[Long]("vec_id")))
      .view.mapValues(_.map(_.getAs[Array[Byte]]("pq_code").toSeq).distinct)
    byDir.foreach { case (d, cs) =>
      assert(cs.size == 1, s"direction $d produced ${cs.size} distinct codes")
    }
    // distinct directions land on distinct codes (orthogonal, k=4 seeds
    // cover ≥2 directions; with 4 clean clusters Lloyd separates them)
    assert(codes.map(_.getAs[Array[Byte]]("pq_code").toSeq).distinct.length == 4)
  }

  test("ADC is exact when vectors coincide with centroids") {
    // every distinct unit vector is its own centroid (k = 4 distinct
    // sub-vectors per sub-space after normalization), so reconstruction
    // is exact and pq_cosine == true cosine
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 3)
    val codes = Pq.encode(df, "embedding", cb).select("vec_id", "pq_code")
    val q = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val top = Pq.topK(codes, "vec_id", cb, q, k = 20).collect()
    val exact = Similarity.cosineTopK(df, "embedding", "vec_id", q, 20)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    top.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("pq_cosine") - exact(id)) < 1e-9,
        s"pq_cosine for $id diverged from exact cosine")
    }
    // colinear-with-query rows (direction 0) rank first at cosine 1
    assert(top.take(5).map(_.getAs[Long]("vec_id")).toSeq == idsOfDir(0))
  }

  test("topKJoin matches per-query topK") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val codes = Pq.encode(df, "embedding", cb).select("vec_id", "pq_code")
    val queries = Seq(
      (100L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (101L, Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val joined = Pq.topKJoin(queries, codes, cb, k = 5)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("pq_cosine"))).toSeq)
      .toMap
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val single = Pq.topK(codes, "vec_id", cb, qr.getSeq[Float](1), k = 5)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("pq_cosine"))).toSeq
      assert(joined(qid) == single, s"join path diverged for query $qid")
    }
  }

  test("NULL contracts: ragged vectors and cross-codebook codes") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 1)
    // ragged vector (length 6 != dim 8) encodes as NULL
    val ragged = Seq((99L, Seq(1f, 2f, 3f, 4f, 5f, 6f))).toDF("vec_id", "embedding")
    val r = Pq.encode(ragged, "embedding", cb).select("pq_code").head()
    assert(r.isNullAt(0), "ragged vector must encode as NULL")
    // a code from a different geometry (m=4) scores NULL against cb's table
    val cb4 = Pq.train(df, "embedding", "vec_id", m = 4, k = 4, iters = 1)
    val codes4 = Pq.encode(df, "embedding", cb4).select("vec_id", "pq_code")
    val scored = Pq.topK(codes4, "vec_id", cb,
      Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), k = 20).collect()
    assert(scored.isEmpty, "cross-codebook codes must score NULL, never mis-score")
  }

  test("topKJoin refuses oversized query sets loudly") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 1)
    val codes = Pq.encode(df, "embedding", cb).select("vec_id", "pq_code")
    val bigQ = sp.range(0, 50).select(col("id").as("vec_id"),
      array(Seq.fill(8)(lit(1f)): _*).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Pq.topKJoin(bigQ, codes, cb, k = 3, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries"), e.getMessage)
    // raising the cap knowingly works
    assert(Pq.topKJoin(bigQ, codes, cb, k = 3, maxQueries = 100)
      .select(countDistinct(col("query_id"))).head().getLong(0) == 50L)
  }

  test("codebook save/load round-trips exactly") {
    val df = corpusDf
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    Pq.saveCodebook(spark, cb, dir)
    val loaded = Pq.loadCodebook(spark, dir)
    assert(loaded.dim == cb.dim && loaded.m == cb.m && loaded.k == cb.k)
    assert(loaded.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq,
      "doubles must round-trip parquet bit-exactly")
  }

  test("IVF-PQ composition probes only the query's cells and finds planted rows") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val index = Similarity.buildIvfIndex(df, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val pqCells = Pq.encodeCells(index, cb)
    assert(pqCells.columns.toSeq == Seq("vec_id", "__cell", "pq_code"))
    val q = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val hits = Pq.ivfPqTopK(pqCells, index.centroids, cb, "vec_id", q,
      k = 5, nProbe = 1).collect()
    // direction-1 rows live in one cell; probing that single cell must
    // return exactly them at pq_cosine 1
    assert(hits.map(_.getAs[Long]("vec_id")).toSeq == idsOfDir(1))
    hits.foreach(r => assert(math.abs(r.getAs[Double]("pq_cosine") - 1.0) < 1e-9))
  }

  test("durable IVF-PQ index: save/load round-trip, probe prunes partitions") {
    val df = corpusDf
    val index = Similarity.buildIvfIndex(df, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val pqCells = Pq.encodeCells(index, cb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Pq.saveIvfPq(pqCells, index.centroids, cb, dir)
    val (cells, cents, cb2) = Pq.loadIvfPq(spark, dir)
    assert(cb2.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    assert(cents.map(_.toSeq).toSeq == index.centroids.map(_.toSeq).toSeq)
    val q = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val probe = Pq.ivfPqTopK(cells, cents, cb2, "vec_id", q, k = 5, nProbe = 1)
    // identical answer to the in-memory composition...
    val mem = Pq.ivfPqTopK(pqCells, index.centroids, cb, "vec_id", q,
      k = 5, nProbe = 1)
    assert(probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      mem.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // ...and the cell filter reaches the scan as a PARTITION filter
    // (file-level pruning — the at-rest sub-linear probe)
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.split("\n").find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("__cell")),
      s"__cell probe must prune partitions at the scan:\n$plan")
  }

  test("updateIvfPq folds a batch in O(batch): appended rows probe identically") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val index = Similarity.buildIvfIndex(df, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_up").toString
    Pq.saveIvfPq(Pq.encodeCells(index, cb), index.centroids, cb, dir)
    // new batch: two more direction-1 vectors (ids disjoint from stored)
    val batch = Seq(
      (100L, Seq(0f, 7f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (101L, Seq(0f, 9f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    Pq.updateIvfPq(spark, dir, batch, "embedding", "vec_id")
    val (cells, cents, cb2) = Pq.loadIvfPq(spark, dir)
    assert(cells.count() == 22L)
    val q = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val hits = Pq.ivfPqTopK(cells, cents, cb2, "vec_id", q, k = 7, nProbe = 1)
      .collect().map(_.getLong(0)).toSeq
    // the appended rows join the stored direction-1 rows in ONE cell
    // (identical codes — batch encode must replay the build arithmetic)
    assert(hits == (idsOfDir(1) ++ Seq(100L, 101L)).sorted, s"got $hits")
  }

  test("trainFraction sampling is content-deterministic across partitionings") {
    val df = corpusDf
    def cbOf(parts: Int) = Pq.train(df.repartition(parts), "embedding",
      "vec_id", m = 2, k = 4, iters = 2, trainFraction = 0.7)
      .centroids.map(_.map(_.toSeq).toSeq).toSeq
    // df.sample would select different rows per physical split (per-
    // partition RNG); the id-hash threshold selects the same CONTENT
    assert(cbOf(1) == cbOf(7),
      "sampled training must be identical regardless of partitioning")
  }

  test("updateIvfPq honors a custom code column from the stored schema") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val index = Similarity.buildIvfIndex(df, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_cc").toString
    Pq.saveIvfPq(Pq.encodeCells(index, cb, codeCol = "code8"),
      index.centroids, cb, dir)
    val batch = Seq((200L, Seq(0f, 0f, 5f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    Pq.updateIvfPq(spark, dir, batch, "embedding", "vec_id")
    val (cells, cents, cb2) = Pq.loadIvfPq(spark, dir)
    // the appended row carries the SAME code column — a hardcoded
    // default would have split the schema and NULLed one side's codes
    assert(cells.columns.count(_ == "code8") == 1 &&
      !cells.columns.contains("pq_code"))
    assert(cells.where(col("code8").isNull).count() == 0L)
    val q = Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
    val hits = Pq.ivfPqTopK(cells, cents, cb2, "vec_id", q, k = 6,
      nProbe = 1, codeCol = "code8").collect().map(_.getLong(0)).toSeq
    assert(hits == (idsOfDir(2) ++ Seq(200L)).sorted, s"got $hits")
  }

  test("plan shapes: encode/topK are joinless narrow passes; topKJoin stays BHJ") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 4, iters = 1)
    val enc = Pq.encode(df, "embedding", cb).queryExecution.executedPlan.toString
    assert(!enc.contains("Exchange") && !enc.contains("Join"),
      s"encode must be a joinless narrow pass:\n$enc")
    val codes = Pq.encode(df, "embedding", cb).select("vec_id", "pq_code")
    val top = Pq.topK(codes, "vec_id", cb, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 5)
      .queryExecution.executedPlan.toString
    assert(!top.contains("Join") && top.contains("TakeOrdered"),
      s"topK must be scan->project->TakeOrdered:\n$top")
    val queries = Seq((100L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val joined = Pq.topKJoin(queries, codes, cb, k = 5)
      .queryExecution.executedPlan.toString
    assert(joined.contains("BroadcastHashJoin") &&
      !joined.contains("BroadcastNestedLoopJoin") &&
      !joined.contains("CartesianProduct"),
      s"topKJoin must keep a BroadcastHashJoin (never BNLJ):\n$joined")
  }

  test("train guards: bad m/k/dim and empty corpus fail loudly") {
    val sp = spark; import sp.implicits._
    val df = corpusDf
    intercept[IllegalArgumentException] {
      Pq.train(df, "embedding", "vec_id", m = 3, k = 4) // 8 % 3 != 0
    }
    intercept[IllegalArgumentException] {
      Pq.train(df, "embedding", "vec_id", m = 2, k = 300) // k > 256
    }
    intercept[IllegalArgumentException] {
      Pq.train(df.where(col("vec_id") < 0), "embedding", "vec_id", m = 2, k = 4)
    }
  }
}
