package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization — the memory half of the ANN scale story.
  *
  * [[Similarity]]'s IVF/LSH paths bound how many candidates a query
  * SCANS; PQ bounds how much memory each candidate COSTS: a 64-dim
  * float embedding (256 B) collapses to an m-byte code (8 B at m=8,
  * 32×), so a 100-TB embedding corpus becomes a few TB of codes — the
  * difference between "the index fits the cluster's RAM" and "every
  * probe hits object storage". Queries score codes with ADC (asymmetric
  * distance computation): one O(k·dim) table per query, then m array
  * lookups per candidate — no decode, no per-candidate O(dim) work.
  *
  * Distance contract: vectors are unit-normalized before training and
  * encoding, so squared L2 is monotone with cosine (‖a−b‖² = 2·(1−cos))
  * and every surface reports `pq_cosine = 1 − adc/2` — directly
  * comparable with the exact/LSH/IVF surfaces' `cosine`. Codes are
  * deterministic (md5-seeded k-means, fixed Lloyd rounds, first-min
  * ties): identical codebooks and codes on every run/cluster.
  *
  * Scale shape: training aggregates m·k (subDim+1)-double rows per
  * Lloyd round (map-side combined — the collect is the codebook, not
  * the data); encoding is ONE narrow pass with the codebook riding as a
  * single flat plan literal (≤256·dim doubles by the k ≤ 256 cap — no
  * join, no shuffle); querying ships per-query ADC tables the same way
  * (single query) or as broadcast data (batched join). Compose
  * with IVF ([[encodeCells]] / [[ivfPqTopK]]) to scan only nProbe/k of
  * the codes: the classic IVF-PQ index is (id, cell, code) ≈ 14 B/row.
  *
  * Recall levers (r16, measured in BASELINE.md's "Round 16 ledger",
  * section "pqrecall"): [[train]] cuts RAW COORDINATE BLOCKS;
  * [[trainOpq]] learns an orthogonal rotation first (OPQ) so correlated
  * dimensions stop over-spending code bytes — worth ~+0.1 recall@10 on
  * correlated embeddings (PqOpqSuite's pinned fixture) and neutral on
  * isotropic ones (rotating white noise is white noise — the harness
  * corpus is near-isotropic, so its ledger shows parity, not gain).
  * For END recall the big lever is [[topKRefined]] /
  * [[ivfPqTopKRefined]]: ADC as a shortlist FILTER + exact re-rank of
  * `candidates` true vectors (0.47 → 0.93 recall@10 at candidates=100
  * on the harness corpus; near-dup recall is 1.000 at every config,
  * pinned in ScaleSuite).
  */
object Pq {

  /** Trained codebook: `centroids(s)(j)` is the j-th centroid of
    * sub-space s (subDim doubles each). `dim` = Σ subDims; k ≤ 256 so
    * codes pack one byte per sub-space.
    *
    * `rotation` (OPQ, r16): an optional dim×dim ORTHOGONAL matrix R
    * applied to every unit vector BEFORE sub-space splitting — encode
    * quantizes R·u and queries build their ADC table from R·q, so all
    * distances live in the rotated space where they equal the original
    * ones exactly (‖R·a − R·b‖ = ‖a − b‖ for orthogonal R; pq_cosine's
    * 1 − adc/2 contract is unchanged). Centroids are stored in ROTATED
    * coordinates; R travels with the codebook ([[saveCodebook]]), so
    * stored codes, updates, and probes all agree by construction. */
  final case class PqCodebook(dim: Int, m: Int, k: Int,
                              centroids: Array[Array[Array[Double]]],
                              rotation: Option[Array[Array[Double]]] = None,
                              residual: Boolean = false) {
    rotation.foreach { r =>
      require(r.length == dim && r.forall(_.length == dim),
        s"rotation must be ${dim}x$dim, got ${r.length}x" +
          s"${r.headOption.map(_.length).getOrElse(0)}")
    }
    // a rotation is trained on (and applies to) whole unit vectors; a
    // residual codebook quantizes per-cell differences — composing the
    // two silently would put codes and ADC tables in different spaces
    require(!(residual && rotation.isDefined),
      "residual codebooks do not compose with an OPQ rotation")
    require(centroids.length == m, s"codebook has ${centroids.length} sub-spaces, expected $m")
    // every sub-space carries exactly k centroids — the invariant both
    // ADC table builders (this driver-side twin AND the distributed
    // PqTableExpr kernel, which NULLs on a per-sub-space count mismatch)
    // depend on; enforcing it here keeps the two surfaces equivalent for
    // ANY codebook, not just library-built ones
    require(centroids.forall(_.length == k),
      s"every sub-space must have exactly k=$k centroids, got " +
        centroids.map(_.length).mkString(","))
    def subDim: Int = dim / m

    /** Flat m·k ADC table for a (unit) query — driver-side twin of
      * [[graft.expressions.PqKernels.pqTable]]. Applies `rotation`
      * first (same accumulation order as the distributed
      * [[graft.expressions.VectorKernels.matVec]] kernel — pinned
      * bit-equal by PqOpqSuite). */
    private[operators] def tableFor(rawUnitQ: Array[Double]): Array[Double] = {
      require(rawUnitQ.length == dim, s"query dim ${rawUnitQ.length} != codebook dim $dim")
      val unitQ = rotation match {
        case Some(r) =>
          val o = new Array[Double](dim)
          var i = 0
          while (i < dim) {
            val row = r(i)
            var acc = 0.0
            var j = 0
            while (j < dim) { acc += row(j) * rawUnitQ(j); j += 1 }
            o(i) = acc; i += 1
          }
          o
        case None => rawUnitQ
      }
      val out = new Array[Double](m * k)
      var off = 0
      var s = 0
      while (s < m) {
        val cents = centroids(s)
        var i = 0
        while (i < cents.length) {
          var d = 0.0
          var j = 0
          while (j < cents(i).length) {
            val t = cents(i)(j) - unitQ(off + j); d += t * t; j += 1
          }
          out(s * k + i) = d
          i += 1
        }
        off += cents.headOption.map(_.length).getOrElse(0)
        s += 1
      }
      out
    }
  }

  private val bridge = org.apache.spark.sql.GraftColumnBridge

  private def unit(vec: Column): Column =
    bridge.column(graft.expressions.UnitVec(bridge.expression(vec)))

  /** Driver-side unit normalization through the SAME kernel the
    * distributed paths run ([[graft.expressions.VectorKernels.unitVec]])
    * — the topK-vs-topKJoin bit-equality contract must live in ONE
    * place, not in a hand-kept mirror whose accumulation order could
    * drift (the AnnIndex.topK/planeSignature convention). */
  private def unitLocal(v: Seq[Float]): Array[Double] =
    graft.expressions.VectorKernels.unitVec(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
      isFloat = true).toDoubleArray()

  /** The codebook as ONE flat plan literal (a single `Literal.create`
    * node wrapping nested ArrayData — not a per-element CreateArray
    * tree, which is what blew task binaries in the IVF k≈32 experiments
    * and motivated [[Similarity]]'s broadcast-data pattern). PQ's k ≤
    * 256 cap bounds this at 256·dim doubles (~128 KB at dim 64), well
    * inside task-binary comfort, and the literal sidesteps the
    * constant-key one-row join entirely — which Catalyst folds into a
    * BroadcastNestedLoopJoin (foldable keys constant-fold out of the
    * equi-join), the all-pairs shape the plan sweep bans. */
  private def codebookLit(cb: PqCodebook): Column =
    typedlit(cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)

  /** The OPQ rotation as one flat plan literal — dim² doubles (32 KB at
    * dim 64), the [[codebookLit]] pattern. */
  private def rotationLit(r: Array[Array[Double]]): Column =
    typedlit(r.map(_.toSeq).toSeq)

  /** Apply an optional OPQ rotation to an already-unit column — the ONE
    * projection every PQ surface (train slices, encode, distributed ADC
    * tables) must share so codes and tables always live in the same
    * space. Identity (no-op) when no rotation was trained. */
  private def rotated(rot: Option[Array[Array[Double]]], u: Column): Column =
    rot match {
      case Some(r) => bridge.column(graft.expressions.MatVec(
        bridge.expression(rotationLit(r)), bridge.expression(u)))
      case None => u
    }

  private def rotatedUnit(cb: PqCodebook, vec: Column): Column =
    rotated(cb.rotation, unit(vec))

  /** Train a PQ codebook: per-sub-space k-means over unit-normalized
    * vectors. Deterministic (seed rows = lowest md5(id), fixed `iters`
    * Lloyd rounds, and a CONTENT-deterministic `trainFraction` sample —
    * id-hash threshold, identical rows regardless of partitioning).
    *
    * At corpus scale pass a small `trainFraction`: k-means needs a few
    * hundred points per centroid, not the corpus — 10⁵–10⁶ sampled rows
    * train k=256 fine and the full corpus is only ever touched by
    * [[encode]]'s single pass. Each Lloyd round shuffles m rows per
    * input row but map-side combines to m·k aggregation rows. */
  def train(df: DataFrame, vecCol: String, idCol: String,
            m: Int = 8, k: Int = 256, iters: Int = 3,
            trainFraction: Double = 1.0): PqCodebook =
    trainCore(df, vecCol, idCol, m, k, iters, trainFraction, rotation = None)

  private def trainCore(df: DataFrame, vecCol: String, idCol: String,
                        m: Int, k: Int, iters: Int, trainFraction: Double,
                        rotation: Option[Array[Array[Double]]],
                        preNormalized: Boolean = false): PqCodebook = {
    require(m >= 1, s"m must be positive, got $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256] (one byte per sub-space), got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val spark = df.sparkSession
    import spark.implicits._

    // probe the dimension from a NON-NULL row: every other surface
    // tolerates null/ragged vectors (filtered, NULL-coded) — one null
    // row in dirty data must not kill training with an opaque NPE
    val dimRow = df.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).take(1)
    require(dimRow.nonEmpty,
      s"cannot train a PQ codebook over an empty corpus ($vecCol)")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m")
    val subDim = dim / m

    // CONTENT-deterministic sampling (id-hash threshold), not
    // df.sample: Bernoulli sampling draws from a per-partition RNG
    // seeded by (seed + partition index), so the selected rows — and
    // therefore the codebook and every stored code — would change with
    // the input's physical split, breaking the documented
    // identical-on-every-run/cluster contract
    val sampled = if (trainFraction >= 1.0) df
      else df.where(pmod(xxhash64(col(idCol)), lit(1000000L)) <
        lit((trainFraction * 1000000L).toLong))
    // training slices come from the SAME unit→rotate projection encode
    // applies, so centroids live in exactly the space codes are cut in;
    // preNormalized inputs (RESIDUALS — already prepared double arrays
    // that must NOT be re-normalized) pass through untouched
    val base = sampled
      .select(col(idCol).as("__id"),
        (if (preNormalized) col(vecCol)
         else rotated(rotation, unit(col(vecCol)))).as("__u"))
      .where(size(col("__u")) === dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic seeds: the k lowest-md5 rows, sliced per sub-space
      val seedRows = base.orderBy(md5(col("__id").cast("string")), col("__id"))
        .limit(k).select(col("__u")).collect()
        .map(_.getSeq[Double](0).toArray)
      require(seedRows.nonEmpty, s"cannot train a PQ codebook over an empty corpus ($vecCol)")
      var cents: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
        seedRows.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim)))

      // (id, s, subvec) rows: m sub-vectors per input row
      val slices = array((0 until m).map(s =>
        slice(col("__u"), s * subDim + 1, subDim)): _*)
      val sub = base.select(col("__id"), posexplode(slices).as(Seq("__s", "__sv")))

      val vs = udaf(new VecSumCount,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
      for (_ <- 1 to iters) {
        val centsDf = cents.zipWithIndex
          .map { case (c, s) => (s, c.map(_.toSeq).toSeq) }.toSeq
          .toDF("__s", "__cents")
        val assigned = sub.join(broadcast(centsDf), "__s")
          .withColumn("__code", bridge.column(graft.expressions.ArgMinL2(
            bridge.expression(col("__cents")), bridge.expression(col("__sv")))))
        val sums = assigned.groupBy(col("__s"), col("__code"))
          .agg(vs(col("__sv")).as("__sc")).collect()
        val next = cents.map(_.map(_.clone()))
        sums.foreach { r =>
          val s = r.getInt(0); val codeIx = r.getInt(1)
          val arr = r.getSeq[Double](2)
          val n = arr(subDim)
          if (n > 0) {
            var j = 0
            while (j < subDim) { next(s)(codeIx)(j) = arr(j) / n; j += 1 }
          } // empty cells keep their previous centroid
        }
        cents = next
      }
      PqCodebook(dim, m, cents.head.length, cents, rotation)
    } finally { base.unpersist(); () }
  }

  /** Train an OPQ codebook: a learned dim×dim ORTHOGONAL rotation R is
    * fit first (OPQ-NP, Ge et al. CVPR'13 — alternate PQ-fit and the
    * orthogonal-Procrustes solve R = V·Uᵀ from SVD(Xᵀ·Y)), then the
    * distributed codebook trains on rotated vectors ([[train]]'s exact
    * machinery). Decorrelates sub-spaces so raw coordinate blocks stop
    * over-spending code bytes on correlated dims; measured on the
    * correlated-synthetic suite fixture (PqOpqSuite) and the pqrecall
    * ledger (BASELINE.md r16) — on ISOTROPIC data the rotation is
    * recall-neutral by design (any rotation of white noise is white
    * noise), so [[topKRefined]]'s exact re-rank, not OPQ, is the lever
    * for end recall there.
    *
    * The rotation fit is DRIVER-SIDE over a bounded deterministic
    * sample (`opqSampleRows` lowest-md5 ids — the [[train]] seed-row
    * convention; ~10 MB at the default 20k×64): serial arithmetic keeps
    * the identical-on-every-run/cluster codebook contract that a
    * distributed float reduction (partition-order-dependent sums) would
    * break, and OPQ needs a few hundred rows per centroid, not the
    * corpus. Each round is O(n·k·dim) k-means + O(n·dim²) accumulation
    * + one dim×dim SVD (breeze/LAPACK — deterministic for a given
    * input). The corpus itself is only ever touched by the final
    * distributed [[train]] pass and [[encode]]'s single pass. */
  def trainOpq(df: DataFrame, vecCol: String, idCol: String,
               m: Int = 8, k: Int = 256, iters: Int = 3,
               trainFraction: Double = 1.0,
               opqIters: Int = 8, opqSampleRows: Int = 20000,
               opqKmeansIters: Int = 3): PqCodebook = {
    require(m >= 1, s"m must be positive, got $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    require(opqIters >= 1, s"opqIters must be positive, got $opqIters")
    require(opqSampleRows >= 2, s"opqSampleRows too small: $opqSampleRows")
    val dimRow = df.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).take(1)
    require(dimRow.nonEmpty,
      s"cannot train an OPQ codebook over an empty corpus ($vecCol)")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"vector dim $dim is not divisible by m=$m")
    val subDim = dim / m

    // deterministic sample: lowest-md5 ids (content-deterministic, the
    // seed-row convention) — identical rows regardless of partitioning
    val sample: Array[Array[Double]] = df
      .select(col(idCol).as("__id"), unit(col(vecCol)).as("__u"))
      .where(size(col("__u")) === dim)
      .orderBy(md5(col("__id").cast("string")), col("__id"))
      .limit(opqSampleRows)
      .select(col("__u")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty,
      s"cannot train an OPQ codebook over an empty corpus ($vecCol)")
    val n = sample.length
    val kk = math.min(k, n)

    // ---- the OPQ-NP alternation, all serial/deterministic ----
    var rot: Array[Array[Double]] =
      Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    def applyRot(x: Array[Double]): Array[Double] = {
      val o = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        val row = rot(i)
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += row(j) * x(j); j += 1 }
        o(i) = acc; i += 1
      }
      o
    }
    // per-sub-space driver k-means, the exact train() semantics: seeds =
    // first kk sample rows (md5-ordered), first-min ties, empty cells
    // keep their previous centroid
    def kmeansSub(xr: Array[Array[Double]], s: Int): Array[Array[Double]] = {
      val off = s * subDim
      var cents = Array.tabulate(kk)(i =>
        java.util.Arrays.copyOfRange(xr(i), off, off + subDim))
      var it = 0
      while (it < opqKmeansIters) {
        val sums = Array.ofDim[Double](kk, subDim + 1)
        xr.foreach { v =>
          var best = Double.NaN
          var bi = 0
          var i = 0
          while (i < kk) {
            val c = cents(i)
            var d = 0.0
            var j = 0
            while (j < subDim) { val t = c(j) - v(off + j); d += t * t; j += 1 }
            if (d < best || java.lang.Double.isNaN(best)) { best = d; bi = i }
            i += 1
          }
          val row = sums(bi)
          var j = 0
          while (j < subDim) { row(j) += v(off + j); j += 1 }
          row(subDim) += 1.0
        }
        cents = Array.tabulate(kk) { i =>
          val cnt = sums(i)(subDim)
          if (cnt > 0) Array.tabulate(subDim)(j => sums(i)(j) / cnt)
          else cents(i)
        }
        it += 1
      }
      cents
    }
    var round = 0
    while (round < opqIters) {
      val xr = sample.map(applyRot)
      val cents = Array.tabulate(m)(s => kmeansSub(xr, s))
      // reconstruction Y (rotated coords) and A = Σ_n x_n·y_nᵀ
      val a = Array.ofDim[Double](dim, dim)
      var r = 0
      while (r < n) {
        val x = sample(r)
        val v = xr(r)
        val y = new Array[Double](dim)
        var s = 0
        while (s < m) {
          val off = s * subDim
          val cs = cents(s)
          var best = Double.NaN
          var bi = 0
          var i = 0
          while (i < kk) {
            val c = cs(i)
            var d = 0.0
            var j = 0
            while (j < subDim) { val t = c(j) - v(off + j); d += t * t; j += 1 }
            if (d < best || java.lang.Double.isNaN(best)) { best = d; bi = i }
            i += 1
          }
          System.arraycopy(cs(bi), 0, y, off, subDim)
          s += 1
        }
        var i = 0
        while (i < dim) {
          val xi = x(i)
          if (xi != 0.0) {
            val ai = a(i)
            var j = 0
            while (j < dim) { ai(j) += xi * y(j); j += 1 }
          }
          i += 1
        }
        r += 1
      }
      // orthogonal Procrustes: max_R tr(R·A) with A = Xᵀ·Y = U·S·Vᵀ
      // → R = V·Uᵀ = (U·Vᵀ)ᵀ
      val adm = breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) => a(i)(j))
      val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(adm)
      val uvt = u * vt
      rot = Array.tabulate(dim, dim)((i, j) => uvt(j, i))
      round += 1
    }
    trainCore(df, vecCol, idCol, m, k, iters, trainFraction,
      rotation = Some(rot))
  }

  /** Append an m-byte `codeCol` to `df` (all original columns kept):
    * one narrow pass — no join, no shuffle — with the codebook riding as
    * a single flat literal ([[codebookLit]]) into the codegen'd
    * [[graft.expressions.PqEncodeExpr]] kernel. Ragged vectors (length ≠
    * codebook dim) encode as NULL, never mis-encoded. */
  def encode(df: DataFrame, vecCol: String, cb: PqCodebook,
             codeCol: String = "pq_code"): DataFrame = {
    require(!cb.residual,
      "residual codebooks encode relative to a cell centroid — use " +
        "encodeCells/updateIvfPq (they carry the cell assignment)")
    encodePrepared(df, rotatedUnit(cb, col(vecCol)), cb, codeCol)
  }

  /** [[encode]] on an already-PREPARED vector column (residuals, or any
    * caller-projected double array): the kernel quantizes the column
    * as-is — no unit normalization, no rotation. */
  private def encodePrepared(df: DataFrame, prepared: Column,
                             cb: PqCodebook, codeCol: String): DataFrame =
    df.withColumn(codeCol, bridge.column(graft.expressions.PqEncodeExpr(
      bridge.expression(codebookLit(cb)), bridge.expression(prepared))))

  private def subVecCol(a: Column, b: Column): Column =
    bridge.column(graft.expressions.SubVec(
      bridge.expression(a), bridge.expression(b)))

  /** `unit(vecCol) − centroid(__cell)` as `out`, via a broadcast join on
    * the small centroid table — a plan literal indexed by `__cell` would
    * carry ALL k cells (32 MB at k=65536, dim=64) into every task
    * binary; the BHJ ships centroids as broadcast DATA instead. */
  private def withCellResidual(cells: DataFrame, vecCol: String,
                               cents: Array[Array[Double]],
                               out: String): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("__cell", "__cc")
    cells.join(broadcast(cdf), "__cell")
      .withColumn(out, subVecCol(unit(col(vecCol)), col("__cc")))
      .drop("__cc")
  }

  /** Train a RESIDUAL codebook over an IVF index (the standard IVF-PQ
    * formulation — Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011, §IV.A): quantize r = u − c(cell)
    * instead of u itself. Residuals span a fraction of the unit sphere,
    * so the same m bytes cut far finer cells — on the pqrecall harness
    * this is what lifts the COMPOSED IVF-PQ recall (the plain composed
    * path stacks global-quantization error on top of cell-pruning loss;
    * see BASELINE.md r17 "pqrecall residual"). The returned codebook
    * carries `residual = true` and travels through
    * [[saveCodebook]]/[[loadCodebook]]; [[encodeCells]], [[ivfPqTopK]],
    * [[ivfPqTopKRefined]] and [[updateIvfPq]] all branch on it, so the
    * durable-index lifecycle is unchanged for callers. */
  def trainResidual(index: Similarity.IvfIndex, m: Int = 8, k: Int = 256,
                    iters: Int = 3,
                    trainFraction: Double = 1.0): PqCodebook = {
    val resid = withCellResidual(index.cells, index.vecCol,
      index.centroids, "__resid")
    trainCore(resid, "__resid", index.idCol, m, k, iters, trainFraction,
      rotation = None, preNormalized = true).copy(residual = true)
  }

  private def adcCosine(tableCol: Column, codeCol: Column, k: Int): Column =
    lit(1.0) - bridge.column(graft.expressions.PqAdcExpr(
      bridge.expression(tableCol), bridge.expression(codeCol), k)) / lit(2.0)

  /** Approximate top-k by ADC over an encoded corpus: ONE driver-side
    * table (m·k doubles, ≤16 KB at k=256 — a single flat literal) rides
    * into the scan; each code scores in m lookups. `codes` needs only
    * (idCol, codeCol) — the vectors themselves never load. The plan is
    * scan → project → TakeOrdered: no join, no shuffle. Output
    * (idCol, pq_cosine) desc. */
  def topK(codes: DataFrame, idCol: String, cb: PqCodebook,
           queryVec: Seq[Float], k: Int,
           codeCol: String = "pq_code"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(!cb.residual,
      "residual codes score against per-cell shifted tables — probe " +
        "through ivfPqTopK/ivfPqTopKRefined")
    val table = cb.tableFor(unitLocal(queryVec))
    codes
      .select(col(idCol),
        adcCosine(typedlit(table.toSeq), col(codeCol), cb.k).as("pq_cosine"))
      .where(col("pq_cosine").isNotNull)
      .orderBy(col("pq_cosine").desc, col(idCol))
      .limit(k)
  }

  /** Batched ADC top-k JOIN — the [[Similarity.lshTopKJoin]] surface
    * for PQ codes: every query row computes its ADC table DISTRIBUTED
    * (codegen'd [[graft.expressions.PqTableExpr]], codebook broadcast
    * as data) and scans the code table. The query side (query_id +
    * m·k-double table) broadcasts through a constant-key
    * BroadcastHashJoin (never BNLJ) — the corpus codes never shuffle.
    * This is deliberately brute-force over CODES (the PQ trade: m-byte
    * scans are memory-speed); for sub-linear candidate counts compose
    * with IVF via [[ivfPqTopK]].
    *
    * `maxQueries` is the loud broadcast-fit guard (the
    * [[Similarity.cosineTopKJoin]] / asofJoinBroadcast convention): each
    * query row broadcasts an m·k-double ADC table (~16 KB at m=8,
    * k=256), so 100k queries would be a 1.6 GB broadcast — the guard
    * counts the NARROW query side only and refuses with an actionable
    * message instead of an executor OOM. Raise it knowingly, or batch
    * the query set. */
  def topKJoin(queries: DataFrame, codes: DataFrame, cb: PqCodebook,
               k: Int, queryIdCol: String = "vec_id",
               queryVecCol: String = "embedding", idCol: String = "vec_id",
               codeCol: String = "pq_code", maxQueries: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(!cb.residual,
      "residual codes score against per-cell shifted tables — probe " +
        "through ivfPqTopK/ivfPqTopKRefined")
    val nq = queries.select(col(queryIdCol)).count()
    require(nq <= maxQueries,
      s"Pq.topKJoin broadcasts an ~${cb.m * cb.k * 8 / 1024} KB ADC table per query " +
        s"row; $nq queries exceeds maxQueries=$maxQueries (~${nq * cb.m * cb.k * 8 / (1 << 20)} MB). " +
        "Batch the query set or raise maxQueries knowingly.")
    val qt = queries
      .select(col(queryIdCol).as("query_id"),
        bridge.column(graft.expressions.PqTableExpr(
          bridge.expression(codebookLit(cb)),
          bridge.expression(rotatedUnit(cb, col(queryVecCol))))).as("__t"))
      .withColumn("__ck", lit(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("pq_cosine").desc, col(idCol))
    // the stream-side key derives (non-foldably) from the code column so
    // Catalyst cannot constant-fold the equi-keys out of the join and
    // degrade it to a BroadcastNestedLoopJoin; length(code)*0 ≡ 0 for
    // every non-null code, and NULL codes drop here exactly as the
    // pq_cosine IS NOT NULL filter would have dropped them
    codes.withColumn("__ck", length(col(codeCol)) * lit(0))
      .join(broadcast(qt), "__ck")
      .select(col("query_id"), col(idCol),
        adcCosine(col("__t"), col(codeCol), cb.k).as("pq_cosine"))
      .where(col("pq_cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** ADC shortlist + EXACT re-rank — the end-recall lever (FAISS
    * `IndexRefineFlat` pattern): ADC alone caps recall by quantization
    * error (measured floor on the pqrecall harness — BASELINE.md r16:
    * isotropic 64-dim at m=8 tops out near 0.47 recall@10, and OPQ
    * cannot help white noise), but ADC is an excellent FILTER — the
    * true top-k almost always sits inside the ADC top-`candidates`.
    * This probes the m-byte codes for a `candidates`-deep shortlist,
    * then re-ranks ONLY those rows against their true vectors (exact
    * cosine) and returns top-k. Measured: 0.47 → 0.93 recall@10 at
    * candidates=100 on the harness corpus.
    *
    * Scale shape: the codes scan is [[topK]]'s (scan → project →
    * TakeOrdered, no shuffle); the re-rank broadcasts the
    * `candidates`-row id list against the full-vector table — ONE
    * narrow pass, no shuffle, and only `candidates` exact distances
    * actually compute (the BHJ drops every other row before the cosine
    * projects). Cost is O(candidates·dim) math over one vector-table
    * scan — at 100 TB keep the vector table sorted/bucketed by id so
    * the join's min/max stats prune row groups. Output (idCol, cosine)
    * desc — EXACT similarities, directly comparable with
    * [[Similarity.cosineTopK]]. */
  def topKRefined(codes: DataFrame, vectors: DataFrame, cb: PqCodebook,
                  queryVec: Seq[Float], k: Int, candidates: Int = 100,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  codeCol: String = "pq_code"): DataFrame = {
    require(candidates >= k,
      s"candidates ($candidates) must be >= k ($k)")
    val shortlist = topK(codes, idCol, cb, queryVec, candidates, codeCol)
      .select(col(idCol))
    refine(shortlist, vectors, idCol, vecCol, queryVec, k)
  }

  /** The shared exact re-rank tail of [[topKRefined]] /
    * [[ivfPqTopKRefined]]: broadcast the `candidates`-row id shortlist
    * against the true-vector table (one narrow BHJ pass, no shuffle),
    * compute exact cosine ONLY for surviving rows, return top-k with the
    * id tie-break. Both refine surfaces MUST share this block — a
    * tie-break or dedup change applied to one alone would silently
    * diverge the two retrieval paths. */
  private def refine(shortlist: DataFrame, vectors: DataFrame,
                     idCol: String, vecCol: String, queryVec: Seq[Float],
                     k: Int): DataFrame = {
    val q = array(queryVec.map(v => lit(v)): _*)
    vectors.join(broadcast(shortlist), idCol)
      .select(col(idCol), Similarity.cosine(col(vecCol), q).as("cosine"))
      .where(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** [[ivfPqTopK]] + exact re-rank ([[topKRefined]] semantics): the
    * ADC shortlist scans only the nProbe nearest cells' codes, the
    * re-rank touches only `candidates` true vectors. The full
    * RAM-resident-index retrieval story: sub-linear candidate scan
    * (IVF) × 32× smaller scan rows (PQ) × exact end ranking (refine).
    *
    * OPERATING CURVE (measured, pqrecall harness — BASELINE r17): end
    * recall is CEILING-BOUND by cell pruning — no code-side improvement
    * recovers a neighbor whose cell was not probed. Decomposed on the
    * near-isotropic harness corpus (16 cells): exact-vector ceiling
    * 0.46/0.63/0.73/0.82 at nProbe 2/4/6/8, and this refined path
    * tracks the ceiling once `candidates` scales with the probed row
    * count (0.81 at nProbe=8, candidates=200 vs 0.62 at the old
    * nProbe=4, candidates=100 — the refine was starved, not wrong). So:
    * pick nProbe from the recall target against the measured ceiling of
    * YOUR corpus (clustered corpora reach high ceilings at small
    * nProbe; isotropic ones need nProbe ≈ cells/2), then size
    * `candidates` ≈ 10–20% of the expected probed rows (nProbe·N/cells)
    * so ADC noise cannot squeeze true neighbors out of the shortlist.
    * A residual codebook ([[trainResidual]]) sharpens the ADC ordering
    * on clustered data (+0.05 pinned in PqResidualSuite) and is parity
    * on isotropic data — it moves the shortlist quality, never the
    * ceiling. */
  def ivfPqTopKRefined(pqCells: DataFrame, ivfCentroids: Array[Array[Double]],
                       cb: PqCodebook, vectors: DataFrame, idCol: String,
                       queryVec: Seq[Float], k: Int, nProbe: Int = 2,
                       candidates: Int = 100,
                       vecCol: String = "embedding",
                       codeCol: String = "pq_code"): DataFrame = {
    require(candidates >= k,
      s"candidates ($candidates) must be >= k ($k)")
    val shortlist = ivfPqTopK(pqCells, ivfCentroids, cb, idCol, queryVec,
      candidates, nProbe, codeCol).select(col(idCol))
    refine(shortlist, vectors, idCol, vecCol, queryVec, k)
  }

  /** Encode an [[Similarity.IvfIndex]]'s cell table into the classic
    * IVF-PQ index shape (id, __cell, codeCol) — ~(8 + 4 + m) bytes per
    * vector, the form that keeps a corpus-scale index resident. */
  def encodeCells(index: Similarity.IvfIndex, cb: PqCodebook,
                  codeCol: String = "pq_code"): DataFrame =
    (if (cb.residual)
       encodePrepared(withCellResidual(index.cells, index.vecCol,
         index.centroids, "__resid"), col("__resid"), cb, codeCol)
     else encode(index.cells, index.vecCol, cb, codeCol))
      .select(col(index.idCol), col("__cell"), col(codeCol))

  /** IVF-PQ probe: rank cells by the query's dot against the IVF
    * centroids (driver-side, as [[Similarity.IvfIndex.topK]]), scan
    * only the `nProbe` nearest cells' CODES, score by ADC. Candidate
    * count ~ nProbe·N/k cells × m bytes each — sub-linear scan of a
    * RAM-resident index; rerank the returned ids against true vectors
    * downstream if exactness matters. */
  def ivfPqTopK(pqCells: DataFrame, ivfCentroids: Array[Array[Double]],
                cb: PqCodebook, idCol: String, queryVec: Seq[Float],
                k: Int, nProbe: Int = 2,
                codeCol: String = "pq_code"): DataFrame = {
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    val qn = unitLocal(queryVec)
    // float-rounded query for the cell ranking — EXACTLY the
    // [[Similarity.IvfIndex.topK]] arithmetic, so both IVF probe paths
    // pick the same cells for the same query (a full-double dot here
    // could flip the nearest-cell order on a near-equidistant query and
    // the two surfaces would scan different cells)
    val qf = qn.map(_.toFloat)
    val probeCells = ivfCentroids.zipWithIndex.map { case (c, i) =>
      (c.iterator.zip(qf.iterator).map { case (x, y) => x * y.toDouble }.sum, i)
    }.sortBy { case (d, i) => (-d, i) }.take(nProbe).map(_._2)
    if (!cb.residual)
      return topK(pqCells.where(col("__cell").isin(probeCells.toSeq: _*)),
        idCol, cb, queryVec, k, codeCol)
    // RESIDUAL probe: cell c's codes quantize r = u − c, so the ADC
    // table for cell c comes from the SHIFTED query (q − c); then
    // adc ≈ ‖(q−c) − r̂‖² = ‖q − v̂‖² and pq_cosine = 1 − adc/2 keeps
    // the exact same contract as the plain path (q, v unit). One small
    // table per probed cell rides as a when-chain literal keyed on
    // __cell — nProbe·m·k doubles (≤16 KB each), bounded by nProbe, so
    // the task binary never scales with the index's total cell count.
    val tbls = probeCells.map { c =>
      val cc = ivfCentroids(c)
      require(cc.length == qn.length,
        s"query dim ${qn.length} != centroid dim ${cc.length} (cell $c)")
      c -> cb.tableFor(Array.tabulate(qn.length)(j => qn(j) - cc(j)))
    }
    val tblCol = tbls.tail.foldLeft(
      when(col("__cell") === tbls.head._1, typedlit(tbls.head._2.toSeq))) {
      case (acc, (c, t)) => acc.when(col("__cell") === c, typedlit(t.toSeq))
    }
    pqCells.where(col("__cell").isin(probeCells.toSeq: _*))
      .select(col(idCol),
        adcCosine(tblCol, col(codeCol), cb.k).as("pq_cosine"))
      .where(col("pq_cosine").isNotNull)
      .orderBy(col("pq_cosine").desc, col(idCol))
      .limit(k)
  }

  /** Pick PLAIN vs RESIDUAL from the corpus's MEASURED geometry instead
    * of asking the caller to know it: residual quantization wins when
    * residuals are materially smaller than the unit vectors they
    * replace, i.e. when vectors sit close to their assigned centroid —
    * mean cos(u, c(cell)) ≥ `residualDotThreshold` (‖r‖² = 2·(1−dot)
    * for unit u, c: the 0.7 default ≈ residual norm 0.77). Measured on
    * both geometries (BASELINE r17): sigma-tight clusters → dot ≈ 0.99,
    * residual +0.05 ADC recall; the near-isotropic harness → dot ≈ 0.3,
    * residual parity-to-slightly-worse, plain picked. One aggregation
    * pass over the cells decides; the returned codebook's `residual`
    * flag records the choice and every downstream surface branches on
    * it, so callers compose identically either way. */
  def trainAdaptive(index: Similarity.IvfIndex, m: Int = 8, k: Int = 256,
                    iters: Int = 3, trainFraction: Double = 1.0,
                    residualDotThreshold: Double = 0.7): PqCodebook = {
    val spark = index.cells.sparkSession
    import spark.implicits._
    val cdf = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("__cell", "__cent")
    val avgDot = index.cells.join(broadcast(cdf), "__cell")
      .select(avg(bridge.column(graft.expressions.CosineSim(
        bridge.expression(unit(col(index.vecCol))),
        bridge.expression(col("__cent"))))).as("d"))
      .collect().head.getDouble(0)
    if (avgDot >= residualDotThreshold)
      trainResidual(index, m, k, iters, trainFraction)
    else
      train(index.cells, index.vecCol, index.idCol, m, k, iters,
        trainFraction)
  }

  /** Batched IVF-PQ probe — the production query shape ([[ivfPqTopK]]
    * per query row, as ONE plan): every query ranks cells against the
    * broadcast centroid table, keeps its `nProbe` nearest, and ships one
    * ADC table PER (query, probed cell) — shifted (q − c) tables for a
    * residual codebook, the plain rotated-query table otherwise — into a
    * broadcast hash join ON `__cell`. On a [[saveIvfPq]] layout that
    * equi-join key is the partition column, so the scan still prunes to
    * the UNION of all probed cells' directories; each code row then
    * scores in m lookups against exactly the tables of the queries
    * probing its cell. Output (query_id, idCol, pq_cosine, rank).
    *
    * `maxQueryTables` guards the broadcast (the [[topKJoin]]
    * convention): nQueries × nProbe tables of m·k doubles (~16 KB at
    * m=8, k=256) — batch the query set or raise it knowingly. */
  def ivfPqTopKJoin(queries: DataFrame, pqCells: DataFrame,
                    ivfCentroids: Array[Array[Double]], cb: PqCodebook,
                    k: Int, nProbe: Int = 2,
                    queryIdCol: String = "vec_id",
                    queryVecCol: String = "embedding",
                    idCol: String = "vec_id", codeCol: String = "pq_code",
                    maxQueryTables: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
    val spark = queries.sparkSession
    import spark.implicits._
    val nq = queries.select(col(queryIdCol)).count()
    require(nq * nProbe <= maxQueryTables,
      s"Pq.ivfPqTopKJoin broadcasts an ~${cb.m * cb.k * 8 / 1024} KB ADC " +
        s"table per (query, probed cell): $nq queries x nProbe=$nProbe " +
        s"exceeds maxQueryTables=$maxQueryTables " +
        s"(~${nq * nProbe * cb.m * cb.k * 8 / (1 << 20)} MB). Batch the " +
        "query set or raise maxQueryTables knowingly.")
    val cents = ivfCentroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("__cell", "__cent").withColumn("__ck", lit(0))
    // stream-side key derives (non-foldably) from the query vector so
    // Catalyst cannot constant-fold the equi-key out of the centroid
    // join and degrade it to a BroadcastNestedLoopJoin (the topKJoin
    // convention); size(v)*0 ≡ 0 for every non-null vector, and NULL
    // query vectors drop here — they could not rank cells anyway
    val q = queries.select(col(queryIdCol).as("query_id"),
      unit(col(queryVecCol)).as("__qu"))
      .withColumn("__ck", size(col("__qu")) * lit(0))
    // cell ranking FLOAT-ROUNDS the unit query (cast below) — the same
    // rounding [[ivfPqTopK]] applies before its driver-side dot — so the
    // batched and single-query surfaces rank near-equidistant centroids
    // identically and probe the SAME cells for the same query. Cosine of
    // the rounded query against each unit centroid is scale-free per
    // query (its norm divides every cell alike) and the centroid norms
    // are unit by construction (double-rounding ~1e-16, far below the
    // ~1e-8 float-rounding both surfaces now share), so this orders as
    // the single-query dot. The ADC tables below keep the full-double
    // `__qu`, exactly as the single-query path does. Ties break on the
    // lower cell id.
    val wSel = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__dot").desc, col("__cell"))
    val probed = q
      .join(broadcast(cents), "__ck")
      .withColumn("__dot", bridge.column(graft.expressions.CosineSim(
        bridge.expression(col("__qu").cast("array<float>")),
        bridge.expression(col("__cent")))))
      .withColumn("__pr", row_number().over(wSel))
      .where(col("__pr") <= nProbe)
    val tableExpr =
      if (cb.residual)
        bridge.column(graft.expressions.PqTableExpr(
          bridge.expression(codebookLit(cb)),
          bridge.expression(subVecCol(col("__qu"), col("__cent")))))
      else
        bridge.column(graft.expressions.PqTableExpr(
          bridge.expression(codebookLit(cb)),
          bridge.expression(rotated(cb.rotation, col("__qu")))))
    val qt = probed.select(col("query_id"), col("__cell"),
      tableExpr.as("__t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("pq_cosine").desc, col(idCol))
    pqCells.join(broadcast(qt), "__cell")
      .select(col("query_id"), col(idCol),
        adcCosine(col("__t"), col(codeCol), cb.k).as("pq_cosine"))
      .where(col("pq_cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** [[ivfPqTopKJoin]] + exact re-rank — the batched form of
    * [[ivfPqTopKRefined]] (the full retrieval story at the production
    * query shape): the ADC shortlist prunes to nProbe cells per query,
    * then ONLY the `candidates` shortlisted ids per query re-rank
    * against their true vectors (broadcast shortlist → BHJ prune of the
    * vector table → exact cosine → per-query top-k). Output (query_id,
    * idCol, cosine, rank) with EXACT similarities. Size `candidates`
    * per the [[ivfPqTopKRefined]] operating curve. */
  def ivfPqTopKJoinRefined(queries: DataFrame, pqCells: DataFrame,
                           ivfCentroids: Array[Array[Double]],
                           cb: PqCodebook, vectors: DataFrame, k: Int,
                           nProbe: Int = 2, candidates: Int = 100,
                           queryIdCol: String = "vec_id",
                           queryVecCol: String = "embedding",
                           idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           codeCol: String = "pq_code",
                           maxQueryTables: Int = 10000): DataFrame = {
    require(candidates >= k,
      s"candidates ($candidates) must be >= k ($k)")
    val shortlist = ivfPqTopKJoin(queries, pqCells, ivfCentroids, cb,
      candidates, nProbe, queryIdCol, queryVecCol, idCol, codeCol,
      maxQueryTables).select(col("query_id"), col(idCol))
    val qv = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col(idCol))
    vectors.join(broadcast(shortlist), idCol)
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col(idCol),
        Similarity.cosine(col(vecCol), col("__qv")).as("cosine"))
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Persist an IVF-PQ index durably — the probe-able AT-REST form and
    * the real sub-linear-probe story: codes written
    * `partitionBy(__cell)` so a probe PRUNES to its nProbe cell
    * directories at the file level (the scan's PartitionFilters skip
    * every other cell's files — an in-memory cached cell table, by
    * contrast, still scans all rows and only saves the ADC work).
    * Persists the codebook ([[saveCodebook]]) and the IVF centroids
    * alongside; ~(8 + m) bytes/vector on disk plus the parquet
    * dictionary. */
  def saveIvfPq(pqCells: DataFrame, ivfCentroids: Array[Array[Double]],
                cb: PqCodebook, path: String): Unit =
    saveIvfPq(pqCells, ivfCentroids, cb, path, renameFree = false)

  /** `renameFree = true` lays the cells tree out in VERSIONED
    * directories committed by immutable pointer files (`cells_v<N>/` +
    * `cells_ptr.vN`, [[graft.compute.Compaction.VersionedDir]]
    * semantics): [[compactIvfPq]] then rewrites into a FRESH versioned
    * tree and commits with one pointer PUT — zero renames, and readers
    * mid-compaction keep resolving the previous committed tree (no
    * no-cells window at all). [[updateIvfPq]] appends are committer-
    * based in both layouts. Auto-detected on load/update/compact;
    * existing `cells/` indexes are untouched. */
  def saveIvfPq(pqCells: DataFrame, ivfCentroids: Array[Array[Double]],
                cb: PqCodebook, path: String, renameFree: Boolean): Unit = {
    val spark = pqCells.sparkSession
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a save is a FULL REBUILD: clear any previous versioned layout so
    // a surviving higher-seq pointer can never keep resolving the old
    // cells tree (or collide with the fresh v1 pointer write)
    graft.compute.Compaction.VersionedDir.clear(fs, root,
      CellsPtrPrefix, "cells_v")
    if (renameFree) {
      pqCells.write.mode("overwrite").partitionBy("__cell")
        .parquet(s"$path/cells_v1")
      graft.compute.Compaction.VersionedDir.commit(fs, root,
        CellsPtrPrefix, 1, "cells_v1")
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/cells"), true)
      ()
    } else {
      pqCells.write.mode("overwrite").partitionBy("__cell")
        .parquet(s"$path/cells")
    }
    saveCodebook(spark, cb, path)
    ivfCentroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cent").repartition(1)
      .write.mode("overwrite").parquet(s"$path/ivf_centroids")
  }

  private val CellsPtrPrefix = "cells_ptr.v"

  /** [[saveIvfPq]] + the measured recall curve in one call — the
    * calibrated-save path: measure the ceiling once at build time
    * ([[Similarity.nProbeForRecall]] on the IvfIndex, BEFORE the raw
    * vectors are dropped for codes), persist it with the index, and
    * every probe for the index's lifetime picks (nProbe, candidates)
    * from a recall target ([[ivfPqTopKRefinedAuto]]). */
  def saveIvfPqCalibrated(pqCells: DataFrame,
                          ivfCentroids: Array[Array[Double]],
                          cb: PqCodebook, path: String,
                          curve: Map[Int, Double], calibK: Int,
                          renameFree: Boolean = false): Unit = {
    saveIvfPq(pqCells, ivfCentroids, cb, path, renameFree)
    saveRecallCurve(pqCells.sparkSession, path, curve, calibK)
  }

  /** Persist a measured cell-pruning recall curve
    * ([[Similarity.nProbeForRecall]]'s second return) alongside a
    * [[saveIvfPq]]-written index — the index meta that lets every later
    * probe pick its operating point from a TARGET RECALL instead of a
    * hand-carried nProbe. `calibK` records the k the curve was measured
    * at (recall ceilings are k-dependent; callers probing a very
    * different k should recalibrate). */
  def saveRecallCurve(spark: SparkSession, path: String,
                      curve: Map[Int, Double], calibK: Int): Unit = {
    import spark.implicits._
    require(curve.nonEmpty, "empty recall curve")
    curve.toSeq.sorted.map { case (np, r) => (np, r, calibK) }
      .toDF("nprobe", "ceiling", "calib_k").repartition(1)
      .write.mode("overwrite").parquet(s"$path/recall_curve")
  }

  /** The stored curve (and its calibration k), None on a pre-curve
    * index — callers then pass nProbe/candidates by hand as before. */
  def loadRecallCurve(spark: SparkSession, path: String)
      : Option[(Map[Int, Double], Int)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/recall_curve")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val rows = spark.read.parquet(p.toString)
      .select(col("nprobe"), col("ceiling"), col("calib_k")).collect()
    if (rows.isEmpty) None
    else Some((rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap,
      rows.head.getInt(2)))
  }

  /** The measured operating point for a recall target. The stored curve
    * is the exact-vector CEILING (what cell pruning alone permits — no
    * code/refine improvement recovers an unprobed neighbor); COMPOSED
    * recall tracks the ceiling from a few points below once the
    * shortlist is sized right (measured on the pqrecall harness:
    * residual refine at 23% of probed rows lands 0.02 under the
    * ceiling), so the pick adds `ceilingHeadroom` (default 0.05) on top
    * of the target: nProbe = the smallest entry whose ceiling clears
    * target + headroom, falling back to the smallest clearing the bare
    * target, then to the largest measured nProbe (callers should treat
    * that last case as "this corpus defeats IVF pruning at this cell
    * count"). candidates = `candidateFraction` of the expected probed
    * rows (nProbe·N/cells — the documented 10–20% band, default at its
    * top), with two guards: a 10·k FLOOR (when the probed set is small
    * — tight clusters picking nProbe = 1 — a bare fraction starves the
    * shortlist and per-row ADC noise squeezes true neighbors out;
    * measured on the PqResidualSuite fixture: 0.58 end recall at a bare
    * 15% vs target-clearing at the floor) and a probed-rows CAP
    * (re-ranking more rows than were probed is meaningless — refining
    * everything probed IS the ceiling). */
  def operatingPoint(curve: Map[Int, Double], targetRecall: Double,
                     nCells: Int, corpusRows: Long, k: Int,
                     candidateFraction: Double = 0.20,
                     ceilingHeadroom: Double = 0.05): (Int, Int) = {
    require(targetRecall > 0 && targetRecall <= 1,
      s"targetRecall must be in (0,1], got $targetRecall")
    require(candidateFraction > 0 && candidateFraction <= 1,
      s"candidateFraction must be in (0,1], got $candidateFraction")
    require(ceilingHeadroom >= 0 && ceilingHeadroom < 1,
      s"ceilingHeadroom must be in [0,1), got $ceilingHeadroom")
    require(curve.nonEmpty, "empty recall curve")
    val sorted = curve.keys.toSeq.sorted
    val padded = math.min(1.0, targetRecall + ceilingHeadroom)
    val nProbe = sorted.find(np => curve(np) >= padded)
      .orElse(sorted.find(np => curve(np) >= targetRecall))
      .getOrElse(sorted.max)
    val probedRows =
      math.ceil(nProbe.toDouble * corpusRows / math.max(1, nCells)).toLong
    val candidates = math.min(math.max(probedRows, k),
      math.max(10L * k, math.ceil(candidateFraction * probedRows).toLong))
    (nProbe, candidates.toInt)
  }

  /** [[ivfPqTopKRefined]] with the operating point AUTO-PICKED from the
    * index's stored recall curve (VERDICT r17 #5: callers carry a
    * recall TARGET, not tuning constants). `corpusRows` < 0 counts
    * `pqCells` (parquet count is metadata-cheap; pass the known count on
    * hot paths). */
  def ivfPqTopKRefinedAuto(pqCells: DataFrame,
                           ivfCentroids: Array[Array[Double]],
                           cb: PqCodebook, vectors: DataFrame,
                           idCol: String, queryVec: Seq[Float], k: Int,
                           targetRecall: Double, curve: Map[Int, Double],
                           corpusRows: Long = -1L,
                           candidateFraction: Double = 0.20,
                           ceilingHeadroom: Double = 0.05,
                           vecCol: String = "embedding",
                           codeCol: String = "pq_code"): DataFrame = {
    val n = if (corpusRows >= 0) corpusRows else pqCells.count()
    val (nProbe, candidates) = operatingPoint(curve, targetRecall,
      ivfCentroids.length, n, k, candidateFraction, ceilingHeadroom)
    ivfPqTopKRefined(pqCells, ivfCentroids, cb, vectors, idCol, queryVec,
      k, nProbe, candidates, vecCol, codeCol)
  }

  /** [[ivfPqTopKJoinRefined]] with the auto-picked operating point. */
  def ivfPqTopKJoinRefinedAuto(queries: DataFrame, pqCells: DataFrame,
                               ivfCentroids: Array[Array[Double]],
                               cb: PqCodebook, vectors: DataFrame, k: Int,
                               targetRecall: Double,
                               curve: Map[Int, Double],
                               corpusRows: Long = -1L,
                               candidateFraction: Double = 0.20,
                               ceilingHeadroom: Double = 0.05,
                               queryIdCol: String = "vec_id",
                               queryVecCol: String = "embedding",
                               idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               codeCol: String = "pq_code",
                               maxQueryTables: Int = 10000): DataFrame = {
    val n = if (corpusRows >= 0) corpusRows else pqCells.count()
    val (nProbe, candidates) = operatingPoint(curve, targetRecall,
      ivfCentroids.length, n, k, candidateFraction, ceilingHeadroom)
    ivfPqTopKJoinRefined(queries, pqCells, ivfCentroids, cb, vectors, k,
      nProbe, candidates, queryIdCol, queryVecCol, idCol, vecCol,
      codeCol, maxQueryTables)
  }

  /** The committed cells tree: newest valid versioned dir if the index
    * uses the rename-free layout, `cells/` otherwise. Returns the
    * version seq (None = legacy) and the directory path. */
  private def resolveCells(fs: org.apache.hadoop.fs.FileSystem,
                           path: String)
      : (Option[Int], org.apache.hadoop.fs.Path) =
    graft.compute.Compaction.VersionedDir.newest(fs,
      new org.apache.hadoop.fs.Path(path), CellsPtrPrefix) match {
      case Some((seq, d)) =>
        (Some(seq), new org.apache.hadoop.fs.Path(s"$path/$d"))
      case None => (None, new org.apache.hadoop.fs.Path(s"$path/cells"))
    }

  /** Load a [[saveIvfPq]]-written index: (cells, ivfCentroids,
    * codebook). Probe with [[ivfPqTopK]] — the `__cell isin` filter
    * reaches the scan as a partition filter. */
  def loadIvfPq(spark: SparkSession, path: String)
      : (DataFrame, Array[Array[Double]], PqCodebook) = {
    // refuse a mid-swap tree: between compactIvfPq's two renames there
    // is no cells/ directory (or a half-state a crash left behind) —
    // fail with the cause and the remedy named instead of a confusing
    // path-not-found (or worse, a silently partial scan) downstream
    val rootP = new org.apache.hadoop.fs.Path(path)
    val lfs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (lfs.exists(new org.apache.hadoop.fs.Path(rootP, IvfPqManifest)))
      throw new IllegalStateException(
        s"IVF-PQ index at $path has an interrupted compaction swap in " +
          "flight — run Pq.healIvfPq (or compactIvfPq, which heals at " +
          "entry) before loading")
    val cb = loadCodebook(spark, path)
    val rows = spark.read.parquet(s"$path/ivf_centroids")
      .select(col("cell"), col("cent")).collect()
    require(rows.nonEmpty, s"ivf_centroids at $path is empty — corrupt")
    // size by the highest surviving id, not the row count: a partial
    // write that lost an INTERIOR row would otherwise throw a raw
    // ArrayIndexOutOfBounds before the gap check could name the cause
    val cents = new Array[Array[Double]](rows.map(_.getInt(0)).max + 1)
    rows.foreach(r => cents(r.getInt(0)) = r.getSeq[Double](1).toArray)
    require(cents.forall(_ != null),
      s"ivf_centroids at $path has gaps — corrupt or partial write")
    (spark.read.parquet(resolveCells(lfs, path)._2.toString), cents, cb)
  }

  /** Fold a batch of NEW vectors into a [[saveIvfPq]]-written index in
    * place — O(batch), the [[Similarity.updateAnnIndex]] convention:
    * only the batch is assigned (stored centroids, broadcast as data)
    * and encoded (stored codebook), then parquet-APPENDed into its
    * cell partitions. The corpus is never re-read; centroids and
    * codebook are NOT retrained (drift is a rebuild decision, not an
    * ingest one). Batch ids must be disjoint from stored ids — a
    * replayed batch duplicates rows, which dedup-by-id downstream or a
    * fresh save clears ([[compactIvfPq]] with `dedupById`).
    *
    * Refuses (throws) while a [[compactIvfPq]] claim stands on the
    * index — an APPEND into the old tree mid-rewrite would be silently
    * dropped by the swap (unlike the near-dup/ANN row tables, whose
    * file-level compaction manifests never touch unlisted appends, the
    * IVF-PQ compaction swaps the WHOLE tree); retry once the compaction
    * finishes (or after `claimTtlMs` if the compactor crashed — a stale
    * claim is cleared here, and an interrupted swap heals, before the
    * append). The claim is RE-CHECKED after the append lands (plus, on
    * the versioned layout, the committed version seq is compared, and
    * on the legacy layout the pre-append file listing is re-verified —
    * a claim-acquire-swap-release cycle entirely inside the append
    * window is caught either way), so a
    * compaction that claimed DURING this update aborts it LOUDLY
    * instead of silently losing the batch — re-run the update after the
    * compaction; a re-applied batch duplicates rows, which
    * `compactIvfPq(dedupById)` clears (the at-least-once contract). */
  def updateIvfPq(spark: SparkSession, path: String, batch: DataFrame,
                  vecCol: String, idCol: String,
                  claimTtlMs: Long = IvfPqClaimTtlMs,
                  failpoint: String => Unit = _ => ()): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(path)
    val ufs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ivfPqEnsureUnclaimed(ufs, rootP, claimTtlMs, "updateIvfPq")
    healIvfPq(spark, path) // a crashed swap rolls back before the append
    val seqBefore = resolveCells(ufs, path)._1
    val (cells, cents, cb) = loadIvfPq(spark, path)
    // the code column comes from the STORED index's own schema — a
    // hardcoded default would append files whose code column name
    // differs from a custom-named index's, and the schema mismatch
    // would silently NULL one side's codes out of every future probe
    val codeCol = cells.columns.filterNot(c => c == "__cell" || c == idCol)
      .toList match {
      case one :: Nil => one
      case other => throw new IllegalArgumentException(
        s"cannot infer the code column of $path from columns " +
          s"[${cells.columns.mkString(", ")}] with idCol=$idCol — got " +
          s"${other.mkString(", ")}")
    }
    // carry the RAW vector through assignment and encode from it, so the
    // unit-normalization is applied exactly once (as in the build path) —
    // re-unitizing an already-unit double vector shifts values by an ulp
    // and could flip exact-tie codes between build and update
    val assigned = Similarity.assignTo(
      batch.select(col(idCol), col(vecCol).as("__orig"),
        unit(col(vecCol)).as("__u")), cents)
    val cellsDir = resolveCells(ufs, path)._2
    // LEGACY-LAYOUT fingerprint (r16): on the versioned layout a swap
    // shows up as an advanced pointer seq, but on the legacy `cells/`
    // layout seqBefore == seqAfter == None always, so a compaction that
    // acquired the claim, swapped the WHOLE tree, and released entirely
    // inside the append window was invisible to the old guard — the
    // appended batch silently dropped. Snapshot the pre-append file
    // listing (name, length): appends only ADD files, so any pre-append
    // file missing or resized afterwards proves a rewrite landed.
    val legacyFp: Option[Seq[(String, Long)]] =
      if (seqBefore.isEmpty) Some(ivfPqDataFiles(ufs, cellsDir)) else None
    // residual indexes encode the batch the same way the build did:
    // r = unit(orig) − centroid(assigned cell)
    (if (cb.residual)
       encodePrepared(withCellResidual(assigned, "__orig", cents, "__resid"),
         col("__resid"), cb, codeCol)
     else encode(assigned, "__orig", cb, codeCol))
      .select(col(idCol), col("__cell"), col(codeCol))
      .write.mode("append").partitionBy("__cell")
      .parquet(cellsDir.toString)
    failpoint("appended")
    // POST-APPEND GUARD: a compactor that claimed while this append ran
    // read the tree BEFORE these rows landed — its swap will drop them.
    // Presence of the claim (compaction still running), an advanced
    // committed version (versioned compaction already flipped its
    // pointer), or a disturbed legacy tree (fingerprint above) means the
    // batch must be considered LOST: fail loudly so the caller re-runs
    // it (at-least-once; dedupById clears replays).
    val claimedNow =
      ufs.exists(new org.apache.hadoop.fs.Path(rootP, IvfPqClaim))
    val seqAfter = resolveCells(ufs, path)._1
    val legacySwapped = legacyFp.exists { fp =>
      val now = ivfPqDataFiles(ufs, resolveCells(ufs, path)._2).toSet
      !fp.forall(now.contains)
    }
    if (claimedNow || seqAfter != seqBefore || legacySwapped)
      throw new IllegalStateException(
        s"updateIvfPq: a compaction claimed $path DURING this append — " +
          "the batch may be dropped by the in-flight (or just-committed) " +
          "rewrite; re-run the update once the compaction finishes (a " +
          "re-applied batch duplicates rows, which compactIvfPq's " +
          "dedupById clears)")
  }

  /** [[compactIvfPq]] outcome. `dedupedRows` counts duplicate-id rows
    * dropped (0 unless `dedupById` was requested and found some). */
  final case class IvfPqCompactStats(filesBefore: Int, filesAfter: Int,
                                     bytes: Long, cells: Int,
                                     rows: Long, dedupedRows: Long,
                                     healed: Boolean, skipped: Boolean)

  private val IvfPqTmp = ".ivfpq-compact-tmp"
  private val IvfPqOld = ".ivfpq-compact-old"
  private val IvfPqManifest = ".ivfpq-compact-manifest"
  private val IvfPqClaim = ".ivfpq-compact-claim"

  /** Default compaction-claim lease TTL (the shared
    * [[graft.compute.Compaction.FsClaim]] lease semantics). */
  val IvfPqClaimTtlMs: Long = graft.compute.Compaction.FsClaim.DefaultTtlMs

  /** Refuse (throw) while a FRESH compaction claim exists on the index —
    * a live compactor owns it; clear a STALE one (the claimant died;
    * the swap manifest, if it got that far, is healed by the caller). */
  private def ivfPqEnsureUnclaimed(fs: org.apache.hadoop.fs.FileSystem,
                                   root: org.apache.hadoop.fs.Path,
                                   claimTtlMs: Long, ctx: String): Unit =
    graft.compute.Compaction.FsClaim.ensureUnclaimed(fs,
      new org.apache.hadoop.fs.Path(root, IvfPqClaim), claimTtlMs, ctx)

  private def ivfPqDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                             dir: org.apache.hadoop.fs.Path)
      : Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    def walk(d: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(d).foreach { s =>
        val n = s.getPath.getName
        // Spark's hidden-path rule: "." always hidden; "_" hidden UNLESS
        // it's a partition dir (contains "=") — __cell=N must be walked
        if (!n.startsWith(".") && (!n.startsWith("_") || n.contains("="))) {
          if (s.isDirectory) walk(s.getPath)
          else out += ((s.getPath.toString, s.getLen))
        }
      }
    if (fs.exists(dir)) walk(dir)
    out.result()
  }

  /** Compact a [[saveIvfPq]]-written index's `cells/` tree — the index
    * maintenance [[updateIvfPq]] needs: every O(batch) update APPENDs
    * ≥1 file into up-to-k cell partitions, so a daily-update index
    * accumulates exactly the small-file debt
    * [[graft.compute.Compaction]] clears for APPEND partitions. This is
    * the whole-index form of that rewrite (ONE Spark job, not a job per
    * cell — codes are (8+4+m) bytes/vector, so even a billion-vector
    * index rewrites as one modest job): read all cells, optionally drop
    * replayed-batch duplicates (`dedupById` — duplicate ids carry
    * identical (__cell, code) rows under the stored centroids/codebook,
    * so any survivor is correct; this closes [[updateIvfPq]]'s
    * documented at-least-once contract), cluster one-task-per-cell
    * (`repartition(__cell)` — one output file per cell, split only past
    * `targetFileBytes` via maxRecordsPerFile from MEASURED on-disk
    * bytes/row), then swap the directory under a manifest:
    *
    *  1. heal any interrupted previous swap ([[healIvfPq]], rollback);
    *  2. rewrite into `.ivfpq-compact-tmp`;
    *  3. write `.ivfpq-compact-manifest` at the index root, rename
    *     `cells` -> `.ivfpq-compact-old`, rename tmp -> `cells`,
    *     delete the manifest (the healing commit point), clear old.
    *
    * Directory rename is atomic on local/HDFS; an index saved with
    * [[saveIvfPq]] `renameFree = true` (versioned cells tree + pointer
    * commit) compacts with ZERO renames instead — the object-store
    * path, auto-detected. Legacy `cells/` indexes on rename-less
    * stores should run this in a quiet window or be re-saved versioned.
    *
    * Concurrency (r15): the whole compaction runs under a CLAIM file
    * (`.ivfpq-compact-claim`, created with overwrite=false — atomic on
    * local/HDFS) that [[updateIvfPq]] also checks, so a concurrent
    * update FAILS LOUDLY instead of APPENDing into the old tree mid-
    * rewrite and having its batch silently dropped by the swap; a
    * second compactor loses the claim race the same way. A crashed
    * compactor's claim goes stale after `claimTtlMs` and is cleared by
    * the next entrant (the swap manifest, if the crash got that far,
    * heals as before). A controlled failure (exception) releases the
    * claim on the way out. Reads mid-REWRITE are safe (the old cells
    * tree is untouched until the swap); [[loadIvfPq]] refuses an index
    * whose swap manifest is present (mid-swap or crashed-swap state).
    *
    * Skips (skipped=true) when every cell is already at or below the
    * file count its bytes warrant — unless `dedupById` is set, which
    * always rewrites (duplicates can hide inside already-compact
    * files, so presence cannot be decided from the listing). */
  def compactIvfPq(spark: SparkSession, path: String,
                   targetFileBytes: Long = 64L << 20,
                   dedupById: Option[String] = None,
                   failpoint: String => Unit = _ => (),
                   claimTtlMs: Long = IvfPqClaimTtlMs): IvfPqCompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ivfPqEnsureUnclaimed(fs, root, claimTtlMs, "compactIvfPq")
    // CLAIM first, heal under it: a second compactor entering in the
    // ensure-to-acquire window would otherwise run its entry heal
    // (fs.delete of the tmp tree) against a LIVE claimant's in-flight
    // rewrite. The claim is heartbeaten for the rewrite's duration so a
    // long compaction never goes TTL-stale under a bystander's clear.
    val claimPath = new org.apache.hadoop.fs.Path(root, IvfPqClaim)
    val uuid = graft.compute.Compaction.FsClaim
      .acquire(fs, claimPath, "compactIvfPq")
    val hb = graft.compute.Compaction.FsClaim
      .startHeartbeat(fs, claimPath, claimTtlMs, uuid)
    try {
      val healed = healIvfPq(spark, path)
      val (versionSeq, cells) = resolveCells(fs, path)
      require(fs.exists(cells), s"no cells under $path — not an IVF-PQ index")
      compactIvfPqClaimed(spark, fs, root, cells, versionSeq,
        targetFileBytes, dedupById, failpoint, healed)
    } finally {
      hb.close()
      graft.compute.Compaction.FsClaim.release(fs, claimPath, uuid)
    }
  }

  private def compactIvfPqClaimed(spark: SparkSession,
                                  fs: org.apache.hadoop.fs.FileSystem,
                                  root: org.apache.hadoop.fs.Path,
                                  cells: org.apache.hadoop.fs.Path,
                                  versionSeq: Option[Int],
                                  targetFileBytes: Long,
                                  dedupById: Option[String],
                                  failpoint: String => Unit,
                                  healed: Boolean): IvfPqCompactStats = {

    val files = ivfPqDataFiles(fs, cells)
    val total = files.map(_._2).sum
    val byCell = files.groupBy(f =>
      new org.apache.hadoop.fs.Path(f._1).getParent.toString)
    val alreadyCompact = byCell.forall { case (_, fl) =>
      val bytes = fl.map(_._2).sum
      fl.size <= math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    }
    if (alreadyCompact && dedupById.isEmpty) {
      graft.compute.MaintenanceMetrics.add("maintenance.compaction.skipped")
      return IvfPqCompactStats(files.size, files.size, total, byCell.size,
        rows = -1L, dedupedRows = 0L, healed, skipped = true)
    }
    val t0 = System.nanoTime()

    val tmp = new org.apache.hadoop.fs.Path(root, IvfPqTmp)
    fs.delete(tmp, true)
    val df = spark.read.parquet(cells.toString)
    val rowsBefore = df.count()
    val deduped = dedupById match {
      case Some(id) =>
        require(df.columns.contains(id),
          s"dedupById column '$id' not in cells schema " +
            s"[${df.columns.mkString(", ")}]")
        df.dropDuplicates(id)
      case None => df
    }
    val rows = dedupById.fold(rowsBefore)(_ => deduped.count())
    // one task per cell -> one file per cell; cells past targetFileBytes
    // split by row cap derived from the listing's measured bytes/row
    val bytesPerRow = math.max(1L, total / math.max(1L, rowsBefore))
    val maxRecords = math.max(1L, targetFileBytes / bytesPerRow)

    versionSeq match {
      case Some(seq) =>
        // VERSIONED layout (r15): the compacted tree lands in a FRESH
        // versioned directory and ONE immutable pointer PUT commits it —
        // zero renames, no no-cells window for readers (the previous
        // version resolves until the commit instant), crash before the
        // pointer = previous version stays live and the orphan tree is
        // overwritten on retry. GC keeps the previous version as the
        // torn-pointer fallback.
        val next = seq + 1
        val dirName = s"cells_v$next"
        deduped.repartition(col("__cell"))
          .write.mode("overwrite").option("maxRecordsPerFile", maxRecords)
          .partitionBy("__cell").parquet(s"$root/$dirName")
        failpoint("rewritten")
        graft.compute.Compaction.VersionedDir.commit(fs, root,
          CellsPtrPrefix, next, dirName)
        failpoint("committed")
        graft.compute.Compaction.VersionedDir.gc(fs, root,
          CellsPtrPrefix, "cells_v", keepMinSeq = seq)
        val newCells = new org.apache.hadoop.fs.Path(s"$root/$dirName")
        val after = ivfPqDataFiles(fs, newCells)
        graft.compute.Compaction.recordCompaction(files.size, after.size,
          total, t0)
        return IvfPqCompactStats(files.size, after.size, total,
          after.groupBy(f => new org.apache.hadoop.fs.Path(f._1)
            .getParent.toString).size,
          rows, dedupedRows = rowsBefore - rows, healed, skipped = false)
      case None => () // legacy rename swap below
    }

    deduped.repartition(col("__cell"))
      .write.option("maxRecordsPerFile", maxRecords)
      .partitionBy("__cell").parquet(tmp.toString)
    failpoint("rewritten")

    val manifest = new org.apache.hadoop.fs.Path(root, IvfPqManifest)
    val out = fs.create(manifest, true)
    try out.write("swap\n".getBytes("UTF-8")) finally out.close()
    failpoint("manifest-written")

    val old = new org.apache.hadoop.fs.Path(root, IvfPqOld)
    if (!fs.rename(cells, old))
      throw new java.io.IOException(s"compactIvfPq: cannot move $cells aside")
    failpoint("old-moved")
    if (!fs.rename(tmp, cells))
      throw new java.io.IOException(s"compactIvfPq: cannot move new cells in")
    failpoint("new-moved")

    // manifest deletion IS the commit point (heal rolls back while one
    // exists), so it must precede the old-tree delete
    fs.delete(manifest, false)
    failpoint("committed")
    fs.delete(old, true)

    val after = ivfPqDataFiles(fs, cells)
    graft.compute.Compaction.recordCompaction(files.size, after.size,
      total, t0)
    IvfPqCompactStats(files.size, after.size, total,
      after.groupBy(f => new org.apache.hadoop.fs.Path(f._1)
        .getParent.toString).size,
      rows, dedupedRows = rowsBefore - rows, healed, skipped = false)
  }

  /** Roll back an interrupted [[compactIvfPq]] swap. Deterministic from
    * directory state under the manifest: the old tree, once moved
    * aside, is the complete committed index, so rollback restores it
    * and discards the rewrite (which is reproducible). Idempotent;
    * returns true when there was a swap to heal. */
  def healIvfPq(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cells = new org.apache.hadoop.fs.Path(root, "cells")
    val tmp = new org.apache.hadoop.fs.Path(root, IvfPqTmp)
    val old = new org.apache.hadoop.fs.Path(root, IvfPqOld)
    val manifest = new org.apache.hadoop.fs.Path(root, IvfPqManifest)
    if (!fs.exists(manifest)) {
      // stale work dirs only: tmp from a pre-manifest crash (old state
      // intact), or tmp/old from a post-commit crash (new state
      // committed — old only exists alongside a manifest or after it)
      fs.delete(tmp, true)
      fs.delete(old, true)
      return false
    }
    if (fs.exists(old)) {
      // the swap moved the committed tree aside: discard any moved-in
      // new tree and restore it
      fs.delete(cells, true)
      if (!fs.rename(old, cells))
        throw new java.io.IOException(s"healIvfPq: cannot restore $cells")
    }
    fs.delete(tmp, true)
    fs.delete(manifest, false)
    org.slf4j.LoggerFactory.getLogger(Pq.getClass)
      .warn(s"healed interrupted IVF-PQ compaction at $path (rolled back)")
    graft.compute.MaintenanceMetrics.add("maintenance.heal.rolledBack")
    true
  }

  /** Persist a codebook as one parquet row table (s, j, cent) + meta —
    * the durable form matching [[Similarity.saveAnnIndex]]'s layout
    * conventions; save → load is exact (doubles round-trip parquet). */
  def saveCodebook(spark: SparkSession, cb: PqCodebook, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      s <- cb.centroids.indices
      j <- cb.centroids(s).indices
    } yield (s, j, cb.centroids(s)(j).toSeq)
    rows.toDF("s", "j", "cent").repartition(1)
      .write.mode("overwrite").parquet(s"$path/codebook")
    val p = new org.apache.hadoop.fs.Path(s"$path/codebook_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the OPQ rotation travels WITH the codebook (doubles round-trip
    // parquet exactly, so a loaded index encodes/probes bit-identically)
    // — meta's rot flag is authoritative; a stale rotation/ dir from a
    // previous OPQ save is deleted so a plain re-save can't resurrect it
    cb.rotation match {
      case Some(r) =>
        r.indices.map(i => (i, r(i).toSeq)).toDF("i", "row").repartition(1)
          .write.mode("overwrite").parquet(s"$path/rotation")
      case None =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/rotation"), true)
        ()
    }
    val out = fs.create(p, true)
    try out.write((s"dim=${cb.dim}\nm=${cb.m}\nk=${cb.k}\n" +
      s"rot=${if (cb.rotation.isDefined) 1 else 0}\n" +
      s"residual=${if (cb.residual) 1 else 0}\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def loadCodebook(spark: SparkSession, path: String): PqCodebook = {
    val p = new org.apache.hadoop.fs.Path(s"$path/codebook_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val meta =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains("=")).map { l =>
          val Array(a, b) = l.split("=", 2); a -> b }.toMap
      finally in.close()
    val (dim, m, k) = (meta("dim").toInt, meta("m").toInt, meta("k").toInt)
    val rows = spark.read.parquet(s"$path/codebook")
      .select(col("s"), col("j"), col("cent")).collect()
    val cents = Array.ofDim[Array[Double]](m, k)
    // corruption guards (the loadIvfPq convention): out-of-range or
    // missing (s,j) rows must fail HERE with the cause named — a
    // partially written codebook otherwise surfaces as an
    // ArrayIndexOutOfBounds at query time or silently NULL scores
    rows.foreach { r =>
      val (s, j) = (r.getInt(0), r.getInt(1))
      require(s >= 0 && s < m && j >= 0 && j < k,
        s"codebook at $path: entry ($s,$j) outside ${m}x$k — corrupt")
      cents(s)(j) = r.getSeq[Double](2).toArray
    }
    require(cents.forall(_.forall(_ != null)),
      s"codebook at $path is missing (s,j) entries — corrupt or partial write")
    // rot flag in meta is authoritative (absent in pre-r16 indexes →
    // no rotation); same corruption guards as the centroid table
    val rotation =
      if (meta.get("rot").contains("1")) {
        val rrows = spark.read.parquet(s"$path/rotation")
          .select(col("i"), col("row")).collect()
        val r = new Array[Array[Double]](dim)
        rrows.foreach { rr =>
          val i = rr.getInt(0)
          require(i >= 0 && i < dim,
            s"rotation at $path: row $i outside dim $dim — corrupt")
          r(i) = rr.getSeq[Double](1).toArray
        }
        require(r.forall(row => row != null && row.length == dim),
          s"rotation at $path has missing or ragged rows — corrupt or " +
            "partial write")
        Some(r)
      } else None
    // absent in pre-r17 indexes → plain (non-residual) codes
    PqCodebook(dim, m, k, cents, rotation,
      residual = meta.get("residual").contains("1"))
  }
}
