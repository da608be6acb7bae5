package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r16: OPQ rotation (VERDICT r15 #1) + exact-re-rank refine (the end-
  * recall lever) + the suite-pinned recall floors (VERDICT r15 #7).
  *
  * The fixture corpus is CORRELATED by construction (low-rank latent
  * factors through a fixed mixing rotation): raw coordinate-block PQ
  * wastes code bytes on correlated dims there, so the learned rotation
  * shows a real, pinned recall gain — while on the near-isotropic
  * sf0.01 embeddings the pin is on REFINED recall (rotation is
  * provably neutral on white noise; re-ranking is what lifts end
  * recall on such data). All fixtures and training are deterministic,
  * so the pins are constants, not statistical floors.
  */
class PqOpqSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("pq-opq-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val dim = 64
  private val nRows = 1500

  /** Correlated corpus: 12 latent gaussians (decaying scales) + small
    * iid noise, mixed by a fixed random orthogonal-ish matrix. Fixed
    * seed -> identical rows on every run (java.util.Random is spec-
    * pinned), so every pin below is a constant. */
  private lazy val corpus: DataFrame = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val latent = 12
    // fixed mixing matrix (orthonormalized by Gram-Schmidt for a clean
    // rotation — keeps norms comparable across dims)
    val w = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) {
        val d = (0 until dim).map(t => w(i)(t) * w(j)(t)).sum
        (0 until dim).foreach(t => w(i)(t) -= d * w(j)(t))
        j += 1
      }
      val n = math.sqrt((0 until dim).map(t => w(i)(t) * w(i)(t)).sum)
      (0 until dim).foreach(t => w(i)(t) /= n)
      i += 1
    }
    (0L until nRows.toLong).map { id =>
      val z = Array.tabulate(latent)(l => rnd.nextGaussian() * (3.0 - 2.0 * l / latent))
      val raw = Array.tabulate(dim)(t =>
        if (t < latent) z(t) else 0.15 * rnd.nextGaussian())
      val mixed = Array.tabulate(dim)(r =>
        (0 until dim).map(t => w(r)(t) * raw(t)).sum.toFloat)
      (id, mixed.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val queries: Array[(Long, Seq[Float])] =
    corpus.orderBy("vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

  private lazy val groundTruth: Map[Long, Set[Long]] = queries.map {
    case (id, v) =>
      id -> Similarity.cosineTopK(corpus, "embedding", "vec_id", v, 10)
        .collect().map(_.getLong(0)).toSet
  }.toMap

  private def recallOf(f: Seq[Float] => DataFrame): Double = {
    val rs = queries.map { case (id, v) =>
      f(v).collect().map(_.getLong(0)).toSet
        .intersect(groundTruth(id)).size.toDouble / 10.0
    }
    rs.sum / rs.length
  }

  private lazy val plainCb =
    Pq.train(corpus, "embedding", "vec_id", m = 8, k = 64, iters = 3)
  private lazy val opqCb =
    Pq.trainOpq(corpus, "embedding", "vec_id", m = 8, k = 64, iters = 3,
      opqIters = 6, opqKmeansIters = 3)
  private lazy val plainCodes = Pq.encode(corpus, "embedding", plainCb)
    .select(col("vec_id"), col("pq_code")).localCheckpoint()
  private lazy val opqCodes = Pq.encode(corpus, "embedding", opqCb)
    .select(col("vec_id"), col("pq_code")).localCheckpoint()

  test("the learned rotation is orthogonal (R·Rt = I)") {
    val r = opqCb.rotation.get
    assert(r.length == dim && r.forall(_.length == dim))
    for (i <- 0 until dim; j <- 0 until dim) {
      val d = (0 until dim).map(t => r(i)(t) * r(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"RRt($i,$j) = $d")
    }
  }

  test("OPQ lifts ADC recall@10 over plain PQ on correlated embeddings") {
    val plainR = recallOf(v => Pq.topK(plainCodes, "vec_id", plainCb, v, 10))
    val opqR = recallOf(v => Pq.topK(opqCodes, "vec_id", opqCb, v, 10))
    // deterministic fixture -> these are constants; pinned with margin
    assert(opqR >= plainR + 0.03,
      f"OPQ must beat coordinate-block PQ on correlated data: " +
        f"plain=$plainR%.3f opq=$opqR%.3f")
    assert(opqR >= 0.60, f"OPQ recall floor: $opqR%.3f")
  }

  test("refine: ADC shortlist + exact re-rank equals brute force at full depth") {
    val (_, v) = queries.head
    val exact = Similarity.cosineTopK(corpus, "embedding", "vec_id", v, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val refined = Pq.topKRefined(plainCodes, corpus, plainCb, v, 10,
      candidates = nRows).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(refined == exact,
      "candidates = N must reproduce exact top-k bit-for-bit")
  }

  test("refine lifts end recall at a bounded candidate depth; plan stays " +
      "broadcast, never all-pairs") {
    val adcR = recallOf(v => Pq.topK(plainCodes, "vec_id", plainCb, v, 10))
    val refR = recallOf(v =>
      Pq.topKRefined(plainCodes, corpus, plainCb, v, 10, candidates = 100))
    assert(refR >= adcR, f"refine must not lose recall: $adcR%.3f -> $refR%.3f")
    assert(refR >= 0.90, f"refined recall floor: $refR%.3f")
    val plan = Pq.topKRefined(plainCodes, corpus, plainCb, queries.head._2,
      10, candidates = 100).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("identity rotation encodes bit-identically to no rotation") {
    val eye = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    val idCb = plainCb.copy(rotation = Some(eye))
    val a = Pq.encode(corpus, "embedding", plainCb)
      .select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    val b = Pq.encode(corpus, "embedding", idCb)
      .select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(a == b)
  }

  test("driver-side ADC table rotation is bit-equal to the MatVec kernel") {
    val sp = spark; import sp.implicits._
    val (_, v) = queries.head
    // distributed: rotate the unit query through the codegen'd kernel
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val rotLit = typedlit(opqCb.rotation.get.map(_.toSeq).toSeq)
    val rotated = Seq(v).toDF("q")
      .select(bridge.column(graft.expressions.MatVec(
        bridge.expression(rotLit),
        bridge.expression(bridge.column(graft.expressions.UnitVec(
          bridge.expression(col("q"))))))).as("r"))
      .collect().head.getSeq[Double](0).toArray
    // driver: tableFor's internal rotation, reconstructed through the
    // codebook's own table (compare the resulting ADC tables exactly)
    val unitQ = graft.expressions.VectorKernels.unitVec(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
      isFloat = true).toDoubleArray()
    val tableDriver = opqCb.tableFor(unitQ)
    val tableFromKernelRot = opqCb.copy(rotation = None).tableFor(rotated)
    assert(tableDriver.toSeq == tableFromKernelRot.toSeq,
      "driver rotation and MatVec kernel rotation must be bit-equal")
  }

  test("trainOpq is deterministic: identical rotation and codes on re-run") {
    val cb2 = Pq.trainOpq(corpus, "embedding", "vec_id", m = 8, k = 64,
      iters = 3, opqIters = 6, opqKmeansIters = 3)
    assert(opqCb.rotation.get.map(_.toSeq).toSeq ==
      cb2.rotation.get.map(_.toSeq).toSeq, "rotation must be deterministic")
    assert(opqCb.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.centroids.map(_.map(_.toSeq).toSeq).toSeq,
      "centroids must be deterministic")
  }

  test("rotation persists through saveCodebook/loadCodebook exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_opq").toString
    Pq.saveCodebook(spark, opqCb, dir)
    val loaded = Pq.loadCodebook(spark, dir)
    assert(loaded.rotation.isDefined)
    assert(loaded.rotation.get.map(_.toSeq).toSeq ==
      opqCb.rotation.get.map(_.toSeq).toSeq, "doubles round-trip parquet")
    // codes from the loaded codebook are bit-identical
    val a = opqCodes.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    val b = Pq.encode(corpus, "embedding", loaded)
      .select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(a == b)
    // a plain re-save over the same path clears the rotation (meta is
    // authoritative; no resurrection from the stale rotation/ dir)
    Pq.saveCodebook(spark, plainCb, dir)
    assert(Pq.loadCodebook(spark, dir).rotation.isEmpty)
  }

  test("updateIvfPq replays the stored rotation on appended batches") {
    val sp = spark; import sp.implicits._
    val ivf = Similarity.buildIvfIndex(corpus, "embedding", "vec_id",
      k = 4, iters = 2, persist = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_opq_ivf").toString
    Pq.saveIvfPq(Pq.encodeCells(ivf, opqCb), ivf.centroids, opqCb, dir)
    val batch = corpus.where(col("vec_id") < 5)
      .select(col("vec_id") + 100000L as "vec_id", col("embedding"))
    Pq.updateIvfPq(spark, dir, batch, "embedding", "vec_id")
    val (cells, _, loadedCb) = Pq.loadIvfPq(spark, dir)
    assert(loadedCb.rotation.isDefined)
    val appended = cells.where(col("vec_id") >= 100000L)
      .select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    val direct = Pq.encode(batch, "embedding", opqCb)
      .select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(appended == direct,
      "appended codes must be bit-identical to a direct OPQ encode")
  }

  test("real-embedding pin (sf0.01): refined recall floor at m=8") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val qs = emb.orderBy("vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val gt = qs.map { case (id, v) =>
      id -> Similarity.cosineTopK(emb, "embedding", "vec_id", v, 10)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val cb = Pq.train(emb, "embedding", "vec_id", m = 8, k = 256, iters = 3)
    val codes = Pq.encode(emb, "embedding", cb)
      .select(col("vec_id"), col("pq_code")).localCheckpoint()
    val rs = qs.map { case (id, v) =>
      Pq.topKRefined(codes, emb, cb, v, 10, candidates = 100)
        .collect().map(_.getLong(0)).toSet
        .intersect(gt(id)).size.toDouble / 10.0
    }
    val r = rs.sum / rs.length
    // deterministic (fixed corpus + deterministic training) — a codebook
    // or refine regression moves this constant and fails HERE, not in
    // the next round's ledger (the VERDICT r15 #7 ask)
    assert(r >= 0.9, f"refined recall@10 on sf0.01 embeddings: $r%.3f")
  }
}
