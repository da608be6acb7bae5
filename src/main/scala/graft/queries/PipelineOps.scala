package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Multimodal, Pq, Similarity}
import graft.operators.Ckpt._

/** Training-data pipeline operators over the `documents` / `embeddings`
  * tables. Every query carries a DuckDB oracle. For the hash-based ops
  * (LSH, SimHash, fingerprints, ANN) the hash VALUES are engine-specific,
  * so their oracles check hash-independent ground truth instead: exact
  * similarity verification of LSH candidates, planted duplicates /
  * colinear vectors that the bucketing must recover by construction, and
  * equivalence-class structure (fingerprint classes == normalized-content
  * classes).
  */
object PipelineOps {

  // spread: the corpus file is tiny in BYTES (text compresses ~10x) but
  // the per-row text kernels above it carry real CPU — a bytes-based
  // scan split runs them on 1-2 tasks regardless of core count. The
  // Dedup operators spread internally; rows applying raw Column kernels
  // (p23/p09/p33/p06...) need the scan spread here. Measured at 30×
  // scale: p23 78 s -> 18 s (BASELINE r16 "sf1 gate" scaling note).
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.spread(s.read.parquet(s"$dir/documents.parquet"))
  // NO spread: for digest-only rows (md5 -> 16-byte shuffle key) the
  // per-row CPU is trivial next to a round-robin shuffle of the FULL
  // text column — spreading p01 cost a uniform ~2x across all bench
  // reps (r16 BENCH p01 1.156/0.609/0.654 vs r15 0.469/0.347/0.275;
  // VERDICT r16 Next #2). At real scale the input arrives wide and
  // spread would be a no-op anyway; only kernel-heavy rows (p23/p09/
  // p33...) pay for the parallelism they then use.
  private def rawDocs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def queryVec(s: SparkSession, dir: String): Seq[Float] =
    embs(s, dir).where(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup by content digest (shuffle key = 16-byte md5)
    "p01_exact_dedup" -> ((s, dir) => {
      Dedup.exactDedup(rawDocs(s, dir), "text", "doc_id")
        .select("text_hash", "doc_id", "dup_cnt").orderBy("doc_id")
    }),

    // ---- token counting: whitespace, regex word tokens, BPE estimate
    "p02_token_stats" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        size(wordTokens(col("text"))).as("n_word_tokens"),
        bpeTokenEstimate(col("text")).as("n_bpe_est"),
        length(col("text")).as("n_chars_actual"))
        .orderBy("doc_id")
    }),

    // ---- quality signals (stopword ratio, mean token length)
    "p03_quality" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
        round(meanTokenLength(col("text")), 4).as("mean_tok_len"))
        .orderBy("doc_id")
    }),

    // ---- exact word-bigram Jaccard near-dup pairs (inverted-index join)
    "p04_ngram_jaccard" -> ((s, dir) => {
      val sub = docs(s, dir).where(col("doc_id") < 60)
      Dedup.ngramJaccardPairs(sub, "text", "doc_id", n = 2, minJaccard = 0.05)
        .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    }),

    // ---- brute-force cosine top-10 to vec_id=0 (zip_with/aggregate, no UDF)
    "p05_cosine_topk" -> ((s, dir) => {
      Similarity.cosineTopK(embs(s, dir).where(col("vec_id") =!= 0),
          "embedding", "vec_id", queryVec(s, dir), 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
    }),

    // ---- within-label avg pairwise cosine WITHOUT a pair join: for unit
    // vectors u_i, sum_{i<j} u_i·u_j = (|Σu|² − n)/2, so the mean pairwise
    // cosine is (|Σu|² − n)/(n(n−1)) — one explode + two aggregations,
    // O(n·dim) instead of the O(n²) self-join (which planned as a
    // BroadcastNestedLoopJoin — a scale-killer)
    "p06_label_affinity" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("label"), col("embedding"))
      // bind the O(d) norm ONCE per row — inlining it in the transform
      // lambda re-evaluates the aggregate per element (O(d²)/row, the
      // anti-pattern Similarity.quantizeInt8's comment measured 4x slower)
      val normed = e
        .withColumn("__nrm", Similarity.l2norm(col("embedding")))
        .select(col("label"),
          transform(col("embedding"), x => x.cast("double") / col("__nrm")).as("u"))
      val comps = normed.select(col("label"), posexplode(col("u")))
      val centroid = comps.groupBy(col("label"), col("pos"))
        .agg(sum(col("col")).as("s"))
      val ss = centroid.groupBy("label").agg(sum(col("s") * col("s")).as("ss"))
      val cnt = e.groupBy("label").agg(count(lit(1)).as("n"))
      ss.join(cnt, "label").where(col("n") > 1)
        // +0.0 normalizes IEEE negative zero out of the rounded result
        .select(col("label"),
          (round((col("ss") - col("n")) / (col("n") * (col("n") - lit(1))), 4)
            + lit(0.0)).as("avg_cosine"),
          (col("n") * (col("n") - lit(1)) / lit(2)).cast("long").as("pair_cnt"))
        .orderBy("label")
    }),

    // ---- MinHash+LSH banding with EXACT bigram-Jaccard verify: at
    // J>=0.9, k=64, b=16 the banding miss probability per true pair is
    // (1−J⁴)¹⁶ ≈ 4e-8, and the verify step replaces the hash-specific
    // estimate with ground-truth Jaccard — so the result is exactly the
    // set of pairs with true Jaccard >= 0.9, DuckDB-checkable
    "p07_minhash_lsh" -> ((s, dir) => {
      Dedup.lshVerifiedJaccardPairs(docs(s, dir), "text", "doc_id",
          k = 64, bands = 16, shingleN = 2, minJaccard = 0.9)
        .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    }),

    // ---- SimHash recall on planted exact duplicates: identical content
    // must fingerprint identically (hamming 0) and be recovered through the
    // 16-bit banding + exact-hamming verify — ground truth is the planted
    // pair list, independent of the hash values themselves
    "p08_simhash" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val planted = base.where(col("doc_id") < 50)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      Dedup.simhashPairs(base.unionByName(planted), "text", "doc_id",
          maxHamming = 0)
        .where(col("d2") === col("d1") + 10000000L)
        .orderBy("d1")
    }),

    // ---- language-ID, PER DOCUMENT: langId is a pure Column expression
    // (stopword-profile scores + argmax, alphabetical-first ties — the
    // oracle's CASE order), so the same scoring is re-expressed in the
    // DuckDB oracle row by row. A distribution-only comparison would
    // accept any count-preserving permutation of doc→lang assignments
    // (compensating misclassifications aggregate away).
    "p09_langid" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // ---- fingerprint equivalence classes: the FNV value itself is
    // engine-specific, but its CONTRACT — equal iff normalized (lowercased,
    // whitespace-collapsed) content is equal — is oracle-able. Planted
    // case/whitespace variants must land in their source's class.
    "p10_fingerprint" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val planted = base.where(col("doc_id") < 30)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(upper(col("text")), lit("  ")).as("text"))
      val fps = base.unionByName(planted)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      val grp = fps.groupBy("fp")
        .agg(min("doc_id").as("grp_min"), count(lit(1)).as("grp_size"))
      fps.join(grp, "fp")
        .select(col("doc_id"), col("grp_min"), col("grp_size"))
        .orderBy("doc_id")
    }),

    // ---- multimodal plumbing, oracle-able surface: payload byte length,
    // checksum equivalence classes (equal iff payload equal — planted
    // byte-identical copies must merge), and frame-sampling invariants
    // (4 frames that exactly partition the payload)
    "p11_multimodal" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val planted = base.where(col("doc_id") < 40)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      val media = Multimodal.packAsMedia(base.unionByName(planted), "doc_id", "text")
      val feats = Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("byte_len"), col("checksum"))
      val grp = feats.groupBy("checksum")
        .agg(min("media_id").as("dup_min"), count(lit(1)).as("dup_cnt"))
      val frames = Multimodal.sampleFrames(media, 4).toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), sum("frame_len").as("frame_bytes"))
      // REAL codec round-trip: payloads re-encoded as actual PNGs, decoded
      // with javax.imageio — the oracle recomputes the deterministic
      // geometry from the payload length, so width/height/pixel_count
      // match ONLY if a real decoder ran (dims × channels = pixel count)
      val px = Multimodal.decodeImages(
          Multimodal.packAsPngMedia(base.unionByName(planted), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"), col("pixel_count"),
          col("pixel_checksum"))
      // decoded-PIXEL equivalence classes must equal payload classes:
      // geometry comes from the PNG header, but the raster CONTENT is
      // only pinned if byte-identical payloads decode to byte-identical
      // samples (a band-index or sample-read bug keeps geometry intact
      // while scrambling pixels — invisible without this)
      val pxCls = px.groupBy("pixel_checksum")
        .agg(min("media_id").as("pix_min"), count(lit(1)).as("pix_cnt"))
      feats.join(grp, "checksum").join(frames, "media_id")
        .join(px.join(pxCls, "pixel_checksum"), "media_id")
        .select(col("media_id"), col("byte_len"), col("dup_min"),
          col("dup_cnt"), col("n_frames"), col("frame_bytes"),
          col("width"), col("height"), col("channels"), col("pixel_count"),
          col("pix_min"), col("pix_cnt"))
        .orderBy("media_id")
    }),

    // ---- REAL audio decode (javax.sound.sampled WAV/PCM): payloads
    // re-encoded as actual RIFF/WAVE containers, decoded back — the
    // oracle recomputes channels/frames from the payload length, so
    // they match ONLY if a real decoder parsed the container; decoded
    // sample-checksum classes must equal payload classes (planted
    // byte-identical copies merge)
    "p36_audio_decode" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val planted = base.where(col("doc_id") < 40)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      val au = Multimodal.decodeAudio(
        Multimodal.packAsWavMedia(base.unionByName(planted),
          "doc_id", "text")).toDF()
      val grp = au.groupBy("sample_checksum")
        .agg(min("media_id").as("dup_min"), count(lit(1)).as("dup_cnt"))
      au.join(grp, "sample_checksum")
        .select(col("media_id"), col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("frames"), col("sample_count"), col("dup_min"), col("dup_cnt"))
        .orderBy("media_id")
    }),

    // ---- batched IVF join: SAME planted construction and oracle as
    // p20 through ivfTopKJoin, with in-query equality against the
    // single-query IvfIndex.topK path (the p35 pattern for LSH)
    "p37_ivf_join" -> ((s, dir) => {
      import s.implicits._
      val q = queryVec(s, dir)
      val planted = (0 until 10).map(n =>
          (10000L + n, q.map(v => v * (1.0f + 0.1f * (n + 1)))))
        .toDF("vec_id", "embedding")
      val corpus = embs(s, dir).where(col("vec_id") =!= 0)
        .select("vec_id", "embedding").unionByName(planted)
      val index = Similarity.buildIvfIndex(corpus, "embedding", "vec_id",
        k = 8, iters = 2, persist = false)
      val queries = Seq((90001L, q)).toDF("vec_id", "embedding")
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy("vec_id").collect()
      val viaJoin = shaped(
        Similarity.ivfTopKJoin(queries, index, k = 10, nProbe = 2))
      val single = shaped(index.topK(q, 10, nProbe = 2))
      require(viaJoin.toSeq == single.toSeq,
        "ivfTopKJoin diverged from the single-query IVF path")
      s.createDataFrame(java.util.Arrays.asList(viaJoin: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cosine",
            org.apache.spark.sql.types.DoubleType))))
    }),

    // ---- PQ ANN: product-quantized codes (m bytes/vector) scored by
    // ADC, exact-cosine rerank of the retrieved ids (the classic
    // quantize→probe→rerank pipeline). Planted colinear rows encode to
    // the query's own code, so their ADC distance is the query's own
    // quantization error (≪ the ≈0.98 squared-L2 of the best real
    // vector at cosine ≈0.51) — the ADC top-10 must be the planted set
    // and the rerank reports exact cosine 1. In-query equality: the
    // batched topKJoin path must match the single-query topK path.
    "p38_pq_ann" -> ((s, dir) => {
      import s.implicits._
      val q = queryVec(s, dir)
      val planted = (0 until 10).map(n =>
          (10000L + n, q.map(v => v * (1.0f + 0.1f * (n + 1)))))
        .toDF("vec_id", "embedding")
      val corpus = embs(s, dir).where(col("vec_id") =!= 0)
        .select("vec_id", "embedding").unionByName(planted)
      val cb = Pq.train(corpus, "embedding", "vec_id", m = 8, k = 16, iters = 2)
      val codes = Pq.encode(corpus, "embedding", cb).select("vec_id", "pq_code")
      val cand = Pq.topK(codes, "vec_id", cb, q, k = 10)
      val queries = Seq((90001L, q)).toDF("vec_id", "embedding")
      val viaJoin = Pq.topKJoin(queries, codes, cb, k = 10)
        .select("vec_id", "pq_cosine").orderBy("vec_id").collect()
      val single = cand.select("vec_id", "pq_cosine").orderBy("vec_id").collect()
      require(viaJoin.toSeq == single.toSeq,
        "PQ topKJoin diverged from the single-query topK path")
      // retrieval-strength guards the rerank cannot see: k must actually
      // bound the candidate set (an unbounded cand would let the exact
      // rerank rebuild the right answer from the whole corpus), and the
      // ADC scores themselves must be in cosine range and clearly above
      // the ~0.51 max real-real cosine (scale/sign sanity — the rerank
      // replaces pq_cosine, so the oracle never sees it). The bound is
      // sf-aware: the sf0.001 corpus trains a coarser codebook (≈0.79
      // planted ADC vs ≈0.97 at sf0.01), so it pins the MARGIN, not the
      // quantization accuracy.
      require(single.length == 10,
        s"ADC top-k must return exactly k=10 candidates, got ${single.length}")
      require(single.forall { r =>
          val c = r.getDouble(1); c <= 1.0 + 1e-9 && c > 0.55 },
        s"planted ADC cosines out of range: ${single.map(_.getDouble(1)).mkString(",")}")
      Similarity.cosineTopK(
          corpus.join(cand.select("vec_id"), "vec_id"),
          "embedding", "vec_id", q, 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy("vec_id")
    }),

    // ---- incremental IVF-PQ ingest: the index is built WITHOUT the
    // planted rows, persisted (partitionBy cell), and the planted batch
    // is folded in O(batch) via updateIvfPq — the probe of the UPDATED
    // index must recover exactly the planted set (batch assignment +
    // encode replay the build arithmetic bit-for-bit), reranked exact
    "p39_ivfpq_update" -> ((s, dir) => {
      import s.implicits._
      val q = queryVec(s, dir)
      val planted = (0 until 10).map(n =>
          (10000L + n, q.map(v => v * (1.0f + 0.1f * (n + 1)))))
        .toDF("vec_id", "embedding")
      val corpus = embs(s, dir).where(col("vec_id") =!= 0)
        .select("vec_id", "embedding")
      val index = Similarity.buildIvfIndex(corpus, "embedding", "vec_id",
        k = 8, iters = 2, persist = false)
      val cb = Pq.train(corpus, "embedding", "vec_id", m = 8, k = 16, iters = 2)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_p39").toString
      val reranked = try {
        Pq.saveIvfPq(Pq.encodeCells(index, cb), index.centroids, cb, idxDir)
        Pq.updateIvfPq(s, idxDir, planted, "embedding", "vec_id")
        val (cells, cents, cb2) = Pq.loadIvfPq(s, idxDir)
        val cand = Pq.ivfPqTopK(cells, cents, cb2, "vec_id", q,
          k = 10, nProbe = 2).collect()
        // retrieval-strength guard (the rerank would rebuild the right
        // answer from ANY superset): k must bound the candidates, and
        // the appended planted rows' ADC scores must be in cosine range
        // and clearly above the ~0.51 max real-real cosine. The bound is
        // looser than p38's: HERE the codebook was trained WITHOUT the
        // planted direction (that is the point of the update test), so
        // the query's own quantization error is out-of-distribution
        // (measured ≈0.68 at sf0.01) — still safely above every real
        // vector, which carries the same codebook error on top of a
        // lower true cosine
        require(cand.length == 10,
          s"IVF-PQ probe must return exactly k=10, got ${cand.length}")
        require(cand.forall { r =>
            val c = r.getDouble(1); c <= 1.0 + 1e-9 && c > 0.55 },
          s"post-update ADC cosines out of range: ${cand.map(_.getDouble(1)).mkString(",")}")
        val candIds = cand.map(_.getLong(0)).toSeq
          .toDF("vec_id")
        val full = corpus.unionByName(planted)
        Similarity.cosineTopK(
            full.join(candIds, "vec_id"),
            "embedding", "vec_id", q, 10)
          .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
          .orderBy("vec_id").collect()
      } finally org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idxDir))
      s.createDataFrame(java.util.Arrays.asList(reranked: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cosine",
            org.apache.spark.sql.types.DoubleType))))
    }),

    // ---- OPQ-rotated PQ + exact-re-rank refine (r16): the codebook
    // carries a LEARNED orthogonal rotation (trainOpq — decorrelates
    // sub-spaces before block splitting) and retrieval goes ADC
    // shortlist → exact cosine re-rank (topKRefined, the FAISS
    // refine pattern). Planted colinear rows still dominate under
    // rotation (R·(c·u) = c·R·u keeps them colinear with the rotated
    // query, so their ADC error stays the query's own quantization
    // error), the shortlist is HARD-BOUNDED at candidates=10 = k (the
    // re-rank cannot rebuild the answer from a wider set), and the
    // refined output must be the planted set at exact cosine 1.
    "p41_opq_refine" -> ((s, dir) => {
      import s.implicits._
      val q = queryVec(s, dir)
      val planted = (0 until 10).map(n =>
          (10000L + n, q.map(v => v * (1.0f + 0.1f * (n + 1)))))
        .toDF("vec_id", "embedding")
      val corpus = embs(s, dir).where(col("vec_id") =!= 0)
        .select("vec_id", "embedding").unionByName(planted)
      val cb = Pq.trainOpq(corpus, "embedding", "vec_id", m = 8, k = 16,
        iters = 2, opqIters = 3, opqKmeansIters = 2)
      require(cb.rotation.isDefined, "trainOpq must carry a rotation")
      // rotation sanity the refine cannot see: orthogonal rows (unit
      // norm) — a broken Procrustes solve would still often "work"
      // here because planted rows dominate any linear map
      val r0 = cb.rotation.get
      val n0 = r0.map(row => row.map(x => x * x).sum)
      require(n0.forall(n => math.abs(n - 1.0) < 1e-6),
        s"rotation rows must be unit-norm, got ${n0.take(3).mkString(",")}")
      val codes = Pq.encode(corpus, "embedding", cb).select("vec_id", "pq_code")
      Pq.topKRefined(codes, corpus, cb, q, k = 10, candidates = 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy("vec_id")
    }),

    // ---- ANN with provable recall: planted positive multiples of the
    // query vector share its plane signature BY CONSTRUCTION (sign bits are
    // scale-invariant), have cosine exactly 1, and out-rank every real
    // vector (max real pairwise cosine ≈ 0.51) — so the bucketed top-k
    // must return exactly the planted set, = the brute-force answer
    "p12_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val q = queryVec(s, dir)
      val planted = (0 until 10).map(n =>
          (10000L + n, q.map(v => v * (1.0f + 0.1f * (n + 1)))))
        .toDF("vec_id", "embedding")
      val corpus = embs(s, dir).where(col("vec_id") =!= 0)
        .select("vec_id", "embedding").unionByName(planted)
      Similarity.lshTopK(corpus, "embedding", "vec_id", q, k = 10, planes = 6)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy("vec_id")
    }),

    // ---- IVF ANN (the centroid-partitioned scale path, complementing
    // p12's hyperplane LSH): spherical-k-means cells, query probes its
    // nearest cells only. Planted positive multiples of the query vector
    // normalize to (floating-point-close) the SAME unit vector, so they
    // share the query's cell by construction and out-rank every real
    // vector with cosine exactly 1 — the probed top-10 must equal the
    // planted set, independent of how k-means carved the real corpus
    "p20_ivf_ann" -> ((s, dir) => {
      import s.implicits._
      val q = queryVec(s, dir)
      val planted = (0 until 10).map(n =>
          (10000L + n, q.map(v => v * (1.0f + 0.1f * (n + 1)))))
        .toDF("vec_id", "embedding")
      val corpus = embs(s, dir).where(col("vec_id") =!= 0)
        .select("vec_id", "embedding").unionByName(planted)
      val index = Similarity.buildIvfIndex(corpus, "embedding", "vec_id",
        k = 8, iters = 2, persist = false)
      index.topK(q, 10, nProbe = 2)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy("vec_id")
    }),

    // ---- duplicate-cluster resolution: connected components over the
    // near-dup pair graph, canonical representative = min id per cluster
    "p14_dup_clusters" -> ((s, dir) => {
      val sub = docs(s, dir).where(col("doc_id") < 60)
      val pairs = Dedup.ngramJaccardPairs(sub, "text", "doc_id", n = 2, minJaccard = 0.05)
      graft.operators.Clustering
        .connectedComponents(sub.select("doc_id"), "doc_id", pairs)
        .orderBy("doc_id")
    }),

    // ---- deterministic md5-threshold sampling + weighted source mixing
    "p15_deterministic_mix" -> ((s, dir) => {
      val mixed = graft.operators.Sampling.mixByWeight(
        docs(s, dir), "lang", "doc_id",
        Map("en" -> "8000", "de" -> "4000", "fr" -> "2000"))
      mixed.groupBy("lang").agg(count(lit(1)).as("kept"))
        .orderBy("lang")
    }),

    // ---- incremental dedup (daily-ingest shape): a 10% "new batch" is
    // checked against the other 90% "existing corpus" — banding candidates
    // cross the two sets only, exact-Jaccard verified
    "p18_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val newBatch = d.where(col("doc_id") % 10 === 0)
      val existing = d.where(col("doc_id") % 10 =!= 0)
      Dedup.incrementalJaccardPairs(newBatch, existing, "text", "doc_id",
          k = 64, bands = 16, shingleN = 2, minJaccard = 0.9)
        .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    }),

    // ---- r15: the DURABLE VERSIONED near-dup index's whole maintenance
    // loop under the oracle gate — save (rename-free pointer layout) ->
    // fold a daily batch -> rename-free KV compaction of the appended
    // row tables -> load -> probe. Semantics identical to p18 (the index
    // holds exactly the `existing` side), so the same exact-Jaccard
    // oracle pins that NO maintenance step changed a single pair.
    "p40_versioned_index_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val newBatch = d.where(col("doc_id") % 10 === 0)
      val seed = d.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
      val daily = d.where(col("doc_id") % 10 === 5)
      val tmp = java.nio.file.Files.createTempDirectory("graft_p40").toString
      try {
        Dedup.saveNearDupIndex(
          Dedup.buildNearDupIndex(seed, "text", "doc_id", persist = false),
          tmp, renameFree = true)
        Dedup.updateNearDupIndex(s, tmp, daily, "text")
        Dedup.compactNearDupIndexKv(s, tmp,
          new graft.routing.InMemoryConditionalKv)
        val idx = Dedup.loadNearDupIndex(s, tmp, persist = false)
        val rows = Dedup.incrementalJaccardPairs(newBatch, idx, "text",
            minJaccard = 0.9, maxBucketSize = 1000)
          .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
          .orderBy("d1", "d2").collect()
        // small verified pair list — re-materialize driver-side so the
        // returned frame no longer depends on the deleted temp index
        s.createDataFrame(java.util.Arrays.asList(rows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("d1",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("d2",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("jaccard",
              org.apache.spark.sql.types.DoubleType))))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    }),

    // ---- deterministic stratified sampling: exact per-lang quotas picked
    // by hash order (reproducible, engine-agnostic)
    "p16_stratified_sample" -> ((s, dir) => {
      graft.operators.Sampling
        .stratifiedSample(docs(s, dir), "lang", "doc_id", quota = 10)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }),

    // ---- benchmark contamination: corpus docs sharing any trigram with
    // the benchmark set (inverted-index semi-join, never all-pairs)
    "p17_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      val benchmark = d.where(col("doc_id") < 5)
      val corpus = d.where(col("doc_id") >= 5)
      graft.operators.Contamination
        .contaminatedIds(corpus, "text", "doc_id", benchmark, "text", n = 3)
        .orderBy("doc_id")
    }),

    // ---- int8 embedding quantization: integer surface (extrema + nonzero
    // count) is engine-exact, so the quantizer's semantics are oracle-able
    "p19_quantize" -> ((s, dir) => {
      // pos_weighted = Σ qv[i]·(i+1): a POSITION-weighted integer sum
      // pins every element's value AND order (extremum-only columns are
      // permutation-invariant and blind to interior mis-rounding)
      embs(s, dir)
        .select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding")).getField("q").as("qv"))
        .select(col("vec_id"),
          array_max(col("qv")).cast("long").as("max_q"),
          array_min(col("qv")).cast("long").as("min_q"),
          size(filter(col("qv"), x => x =!= 0)).cast("long").as("nonzero"),
          aggregate(
            zip_with(col("qv"), sequence(lit(1L), size(col("qv")).cast("long")),
              (q, i) => q.cast("long") * i),
            lit(0L), (acc, x) => acc + x).as("pos_weighted"))
        .orderBy("vec_id")
    }),

    // ---- embedding near-dup through the BUCKETED operator (no all-pairs
    // join): planted positive multiples share their source's plane
    // signature by construction and verify at cosine exactly 1; the 0.999
    // threshold is far above the max real-real cosine (≈0.51), so the
    // ground truth is exactly the planted pair list
    "p13_embed_neardup" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val planted = e.where(col("vec_id") < 30)
        .select((col("vec_id") + 10000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      Dedup.embeddingNearDupPairs(e.unionByName(planted), "embedding",
          "vec_id", minCosine = 0.999, planes = 8)
        .select(col("d1"), col("d2"), round(col("cosine"), 4).as("cosine"))
        .orderBy("d1", "d2")
    }),

    // ---- SemDeDup-style semantic dedup through the IVF-cell operator:
    // planted positive multiples (the p13/p20 colinear construction)
    // normalize to the same unit vector as their source, so k-means cells
    // cannot separate them — each planted row MUST be dropped with its
    // source (the only lower id within cosine 0.999; max real-real cosine
    // ≈ 0.51) as keeper at cosine exactly 1. Ground truth is the planted
    // list, independent of how the cells carved the real corpus.
    "p21_semantic_dedup" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val planted = e.where(col("vec_id") < 30)
        .select((col("vec_id") + 10000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      // k = 0 ⇒ auto-size (Dedup.semanticK): a hard-coded k=8 tripped the
      // every-cell-over-cap refusal at the sf10 (100×) gate — 200k
      // vectors / 8 cells = 25k per cell > the 10k cap. The ground truth
      // is k-independent: each planted row is COLINEAR with its source
      // (same unit direction ⇒ same nearest centroid at any k), so the
      // pair is co-cellular in every clustering and the drop list never
      // changes; auto-k just keeps cells under the quadratic guard at
      // every SF.
      Dedup.semanticDedupDrops(e.unionByName(planted), "embedding",
          "vec_id", minCosine = 0.999, k = 0, iters = 2)
        .select(col("dropped"), col("keeper"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("dropped")
    }),

    // ---- PII detect + redact: per-doc planted PII (email derived from
    // doc_id, five NANP phone forms, two IPv4s) PLUS adversarial bare
    // digit runs that must NOT match, concatenated with the real document
    // text. The patterns are RE2-compatible by design
    // (TextFunctions.scala) so the oracle replays the SAME pattern
    // strings through DuckDB's regexp engine: counts AND the md5 of the
    // fully redacted text must agree — an engine-portability check of the
    // exact match spans, not just the match count.
    "p22_pii" -> ((s, dir) => {
      val planted = docs(s, dir).where(col("doc_id") < 50).select(
        col("doc_id"),
        concat_ws(" ",
          lit("contact"),
          concat(lit("user"), col("doc_id").cast("string"), lit("@example.com")),
          lit("or (555) 123-4567 or 555.123.4567 or +1 555 123 4567" +
            " or (555)123-4567 or 1-800-555-0199"),
          lit("host 10.0.0.1 and 192.168.1.1"),
          lit("order 5551234567 ref 15551234567 ts 555-123-45678"),
          col("text")).as("text"))
      planted.select(col("doc_id"),
        piiEmailCount(col("text")).as("emails"),
        piiIpCount(col("text")).as("ips"),
        piiPhoneCount(col("text")).as("phones"),
        md5(redactPii(col("text"))).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // ---- repetition-quality stats (Gopher/C4-style): two planted spam
    // lines + the real text + a unique tail per doc; the oracle REPLAYS
    // the dup-bigram / top-bigram / dup-line computations via DuckDB list
    // aggregation — full-fraction agreement on every doc, not a planted
    // constant.
    "p23_repetition" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"),
        concat_ws("\n",
          lit("buy now buy now buy now click here"),
          lit("buy now buy now buy now click here"),
          col("text"),
          concat(lit("unique tail "), col("doc_id").cast("string"))).as("text"))
      t.select(col("doc_id"),
        round(duplicateNgramFraction(col("text"), 2), 4).as("dup_bigram_frac"),
        round(topNgramFraction(col("text"), 2), 4).as("top_bigram_frac"),
        round(duplicateLineFraction(col("text")), 4).as("dup_line_frac"))
        .orderBy("doc_id")
    }),

    // ---- LINE-level corpus dedup (CCNet duplicated-paragraph removal):
    // a boilerplate line planted into every doc must vanish from all of
    // them; naturally repeated corpus lines are removed by the same rule
    "p24_line_dedup" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit("\nsubscribe to our newsletter today")).as("text"))
      graft.operators.Dedup.lineDedup(t, "text", "doc_id", minOccurrences = 2)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_lines"), col("n_removed"))
        .orderBy("doc_id")
    }),

    // ---- unigram-LM quality score (CCNet perplexity proxy): corpus-
    // trained add-one-smoothed unigram logprob, mean per document
    "p25_lm_quality" -> ((s, dir) => {
      graft.operators.CorpusQuality
        .unigramLogProbScore(docs(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          round(col("mean_logprob"), 4).as("mean_logprob"))
        .orderBy("doc_id")
    }),

    // ---- exact shared-span pairs (Lee et al. exact-substring signal):
    // an 8-token sentence planted into docs < 30 must pair them all;
    // naturally shared spans surface by the same rule
    "p26_shared_spans" -> ((s, dir) => {
      val t = docs(s, dir).where(col("doc_id") < 30)
        .select(col("doc_id"),
          concat(col("text"),
            lit(" planted shared span of exactly eight tokens")).as("text"))
      graft.operators.Dedup.sharedSpanPairs(t, "text", "doc_id",
        spanTokens = 8, maxSpanDocs = 1000)
        .orderBy("d1", "d2")
    }),

    // ---- deterministic token-budget selection (training-mix assembly):
    // keep the best-scoring prefix fitting 40% of the corpus tokens
    "p27_token_budget" -> ((s, dir) => {
      // ONE text pass (r21, guide §1.2): the budget total used to run
      // its own agg job over the same lazy plan, re-tokenizing the
      // corpus; now the narrow scored rows are checkpointed once (3
      // numeric cols — Ckpt policy) with the total riding the
      // checkpoint job via observe(), and the budget selection reads
      // the materialized blocks. Same exact long sum, same rows.
      val obs = new org.apache.spark.sql.Observation("p27_total")
      val scored = docs(s, dir).select(col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          round(stopwordRatio(col("text")), 6).as("score"))
        .observe(obs, sum(col("n_tokens")).as("total"))
        .diskCheckpoint()
      val total = obs.get("total").asInstanceOf[Long]
      graft.operators.Sampling.takeByTokenBudget(scored,
        "n_tokens", "score", "doc_id", budget = (total * 2) / 5)
        .select(col("doc_id"), col("n_tokens"), col("score"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // ---- sliding-window document chunking (context-window preparation)
    "p28_chunking" -> ((s, dir) => {
      graft.operators.Packing.chunkDocuments(
        docs(s, dir).where(col("doc_id") < 100),
        "text", "doc_id", chunkTokens = 24, overlapTokens = 8)
        .select(col("doc_id"), col("chunk_idx"),
          md5(col("chunk_text")).as("chunk_md5"), col("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- variable-length maximal shared spans (Lee et al. full form):
    // planted pairs derived purely from doc_id — doc i and doc i+1000
    // share exactly one span of 6+(i%5) tokens (tokens carry i, so no
    // cross-pair matches; boundary tokens are unique per side, so the
    // recovered span cannot extend). Lengths AND positions must come
    // back exactly; the oracle replays the window-join + diagonal-run
    // rule with DuckDB list operations, no hashes.
    "p43_maximal_spans" -> ((s, dir) => {
      val i = col("i").cast("string")
      def tok(parts: org.apache.spark.sql.Column*) = concat(parts: _*)
      val ids = rawDocs(s, dir).where(col("doc_id") < 20)
        .select(col("doc_id").cast("long").as("i"))
      val spanTxt = array_join(transform(
        sequence(lit(0), (col("i") % 5 + 5).cast("int")),
        k => concat(lit("p"), i, lit("t"), k.cast("string"))), " ")
      val a = ids.select(col("i").as("doc_id"),
        concat_ws(" ", tok(lit("a"), i, lit("w0")),
          tok(lit("a"), i, lit("w1")), tok(lit("a"), i, lit("w2")),
          tok(lit("La"), i), spanTxt).as("text"))
      val b = ids.select((col("i") + 1000L).as("doc_id"),
        concat_ws(" ", tok(lit("b"), i, lit("w0")),
          tok(lit("b"), i, lit("w1")), tok(lit("Rb"), i),
          spanTxt).as("text"))
      graft.operators.Dedup.maximalSharedSpans(a.unionByName(b),
          "text", "doc_id", minSpanTokens = 6)
        .select(col("d1"), col("d2"), col("p1").cast("long").as("p1"),
          col("p2").cast("long").as("p2"),
          col("span_tokens").cast("long").as("span_tokens"))
        .orderBy("d1", "p1")
    }),

    // ---- tokenizer-exact budget selection: the p27 shape with the
    // BPE count (planted single-round fixture merges) as the tokenCol —
    // the "wire bpeTokenCount into the budget operators" row. The
    // fixture's pairwise-distinct letters make the oracle exact:
    // count = utf8-bytes − Σ non-overlapping pair occurrences (see
    // graft.functions.Bpe.FixtureMerges).
    "p42_bpe_budget" -> ((s, dir) => {
      val merges = graft.functions.Bpe.fixtureMergesPath()
      // ONE BPE pass (r21, guide §1.2): bpeTokenCount is the most
      // expensive text kernel in the repo (per-doc merge loop), and the
      // budget total used to run it a SECOND time in its own agg job.
      // Checkpoint the 2-numeric-col scored rows once, total via
      // observe() on the same job (see p27).
      val obs = new org.apache.spark.sql.Observation("p42_total")
      val scored = docs(s, dir).select(col("doc_id"),
          bpeTokenCount(col("text"), merges).as("n_tokens"))
        .observe(obs, sum(col("n_tokens")).as("total"))
        .diskCheckpoint()
      val total = obs.get("total").asInstanceOf[Long]
      graft.operators.Sampling.takeByTokenBudget(scored,
        "n_tokens", "n_tokens", "doc_id", budget = (total * 2) / 5)
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // ---- interpolated bigram-LM quality (CCNet ladder, order 2):
    // corpus-trained Jelinek–Mercer bigram⊕unigram mean logprob per doc
    "p44_bigram_lm" -> ((s, dir) => {
      graft.operators.CorpusQuality
        .bigramLogProbScore(docs(s, dir), "text", "doc_id", lambda = 0.7)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("mean_logprob"), 4).as("mean_logprob"))
        .orderBy("doc_id")
    }),

    // ---- reference/target bigram-LM scoring (the CCNet deployment):
    // model trained on the EVEN docs scores the ODD docs — gates the
    // unseen-bigram and unseen-token back-off branches p44's
    // self-scoring can never reach (its joins always hit)
    "p47_bigram_backoff" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.CorpusQuality.bigramLogProbScoreAgainst(
          d.where(col("doc_id") % 2 === 1),
          d.where(col("doc_id") % 2 === 0), "text", "doc_id", lambda = 0.7)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("mean_logprob"), 4).as("mean_logprob"))
        .orderBy("doc_id")
    }),

    // ---- corpus-trained per-DIMENSION SQ8 (FAISS ScalarQuantizer tier):
    // integer surface (extrema + position-weighted sum) is engine-exact,
    // pinning every code's value and order — the p19 oracle idea applied
    // to the trained-scales quantizer
    "p45_sq8" -> ((s, dir) => {
      val e = embs(s, dir)
      val scales = Similarity.trainSq8(e, "embedding")
      Similarity.sq8Encode(e, "embedding", scales, "q")
        .select(col("vec_id"),
          array_max(col("q")).cast("long").as("max_q"),
          array_min(col("q")).cast("long").as("min_q"),
          aggregate(
            zip_with(col("q"), sequence(lit(1L), size(col("q")).cast("long")),
              (q, i) => q.cast("long") * i),
            lit(0L), (acc, x) => acc + x).as("pos_weighted"))
        .orderBy("vec_id")
    }),

    // ---- top-3 TF-IDF terms per document (keyword extraction for
    // curation); rank on the 4-dp-rounded score, term-text tiebreak —
    // engine-replayable order at any parallelism
    "p46_tfidf_terms" -> ((s, dir) => {
      graft.operators.CorpusQuality
        .tfIdfTopTerms(docs(s, dir), "text", "doc_id", topK = 3)
        .orderBy("doc_id", "term_rank")
    }),

    // ---- bloom-prefiltered incremental exact dedup: a batch of half
    // exact-dups / half fresh docs against the whole corpus — only the
    // fresh half survives; the bloom prunes the confirm join
    "p30_incremental_exact" -> ((s, dir) => {
      val batch = docs(s, dir).where(col("doc_id") < 40)
        .select((col("doc_id") + 1000000).as("doc_id"),
          when(col("doc_id") % 2 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" fresh suffix"))).as("text"))
      // pass the corpus count explicitly (parquet count() is a cheap
      // metadata-backed job) so the operator itself makes a single
      // corpus pass — the bloom build
      val corpus = docs(s, dir)
      graft.operators.Dedup.incrementalExactDedup(batch, corpus,
        "text", "doc_id", expectedItems = corpus.count())
        .orderBy("doc_id")
    }),

    // ---- concat-and-split sequence-packing assignment (GPT layout)
    "p29_packing" -> ((s, dir) => {
      val scored = docs(s, dir).select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing.packSequences(scored, "n_tokens", "doc_id",
        seqLen = 512)
        .orderBy("doc_id")
    }),

    // ---- batched ANN join: one planted colinear query per corpus vector
    // 1..8 — positive scaling preserves the sign signature (same bucket by
    // construction) and cosine exactly 1, so each query's top-1 must be
    // its source (max real-real cosine ≈ 0.51 can never outrank it)
    "p32_ann_join" -> ((s, dir) => {
      import s.implicits._
      val corpus = embs(s, dir).select("vec_id", "embedding")
      val queries = corpus.where(col("vec_id").between(1, 8))
        .select((col("vec_id") + 20000L).as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.5f) + col("vec_id").cast("float") / lit(10f)))
            .as("embedding"))
      Similarity.lshTopKJoin(queries, corpus, "embedding", "vec_id",
          k = 1, planes = 6, probeBits = 1)
        .select(col("query_id"), col("vec_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id")
    }),

    // ---- index-backed batched ANN join: same planted construction as
    // p32, but the corpus is hashed ONCE into a durable parquet index
    // (save -> load) and the join probes the stored signature table —
    // the repeated-retrieval path. The recompute path runs alongside and
    // the row sets are asserted equal before returning, so the gate pins
    // BOTH index/recompute agreement and the planted answer.
    "p35_ann_index_join" -> ((s, dir) => {
      val corpus = embs(s, dir).select("vec_id", "embedding")
      val queries = corpus.where(col("vec_id").between(1, 8))
        .select((col("vec_id") + 20000L).as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.5f) + col("vec_id").cast("float") / lit(10f)))
            .as("embedding"))
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id"), col("vec_id"),
          round(col("cosine"), 4).as("cosine")).orderBy("query_id")
      val tmp = java.nio.file.Files.createTempDirectory("graft_annidx").toString
      try {
        Similarity.saveAnnIndex(
          Similarity.buildIndex(corpus, "embedding", "vec_id",
            planes = 6, persist = false), tmp)
        val loaded = Similarity.loadAnnIndex(s, tmp, persist = false)
        val viaIndex = shaped(Similarity.lshTopKJoin(queries, loaded,
          k = 1, probeBits = 1, broadcastQueries = true)).collect()
        val recompute = shaped(Similarity.lshTopKJoin(queries, corpus,
          "embedding", "vec_id", k = 1, planes = 6, probeBits = 1)).collect()
        require(viaIndex.toSeq == recompute.toSeq,
          "index-backed ANN join diverged from the recompute path")
        // 8 verified rows — re-materialize driver-side so the returned
        // frame no longer depends on the deleted temp index
        s.createDataFrame(java.util.Arrays.asList(viaIndex: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("query_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("vec_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("cosine",
              org.apache.spark.sql.types.DoubleType))))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    }),

    // ---- corpus vocabulary: top-50 tokens by frequency (tokenizer prep)
    "p34_vocabulary" -> ((s, dir) => {
      // re-pin the order AFTER the projection: the operator's internal
      // sort is not guaranteed to survive a re-select (every other
      // gated query orders explicitly at the end)
      graft.operators.CorpusQuality.vocabulary(docs(s, dir), "text", topK = 50)
        .select(col("token"), col("cnt").cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
    }),

    // ---- Gopher rule bundle: the standard heuristic pre-filters, each
    // metric + the overall pass flag replayed rule-for-rule in DuckDB
    "p33_gopher_rules" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.word_count"), col("g.mean_word_len"),
          col("g.symbol_word_ratio"), col("g.bullet_line_ratio"),
          col("g.ellipsis_line_ratio"), col("g.passes"))
        .orderBy("doc_id")
    }),

    // ---- source/domain-level filtering (Gopher / RefinedWeb): drop every
    // document of a source whose MEAN composite quality misses the floor —
    // the per-source mean is a decimal sum of 4-dp scores so it is exact
    // at any parallelism, and the threshold splits the sf sources
    "p31_source_filter" -> ((s, dir) => {
      graft.operators.CorpusQuality.filterBySourceQuality(
          docs(s, dir), qualityScore(col("text")), "source",
          minSourceScore = 0.8750)
        .select(col("doc_id"), col("source"), col("source_quality"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // null-text rows key per-row ('null-'||id) on BOTH sides — distinct
    // null documents must never collapse into one survivor
    "p01_exact_dedup" ->
      """SELECT COALESCE(md5(text), 'null-' || doc_id) AS text_hash,
                MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
         FROM documents GROUP BY 1 ORDER BY doc_id""",
    "p02_token_stats" ->
      """SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
         CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS n_bpe_est,
         LENGTH(text) AS n_chars_actual
         FROM documents ORDER BY doc_id""",
    "p03_quality" ->
      """SELECT doc_id,
         ROUND(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x IN ('the','a','an','of','and','to','in','is','on','for','with'))) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')), 4) AS stopword_ratio,
         ROUND(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
               x -> LENGTH(x))) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')), 4) AS mean_tok_len
         FROM documents ORDER BY doc_id""",
    "p04_ngram_jaccard" ->
      """WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                        FROM documents WHERE doc_id < 60),
         pos AS (SELECT doc_id, UNNEST(w) AS word, generate_subscripts(w, 1) AS i FROM words),
         grams AS (SELECT DISTINCT a.doc_id, a.word || ' ' || b.word AS g
                   FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
         common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
                    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 4) AS jaccard
         FROM common JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.05
         ORDER BY d1, d2""",
    "p05_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v,
                           generate_subscripts(embedding, 1) AS i FROM embeddings),
         q AS (SELECT i, v FROM e WHERE vec_id = 0),
         dots AS (SELECT e.vec_id, SUM(e.v * q.v) AS dot, SQRT(SUM(e.v * e.v)) AS ne
                  FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id),
         nq AS (SELECT SQRT(SUM(v * v)) AS n FROM q)
         SELECT vec_id, ROUND(dot / (ne * (SELECT n FROM nq)), 4) AS cosine
         FROM dots WHERE vec_id <> 0
         ORDER BY dot / (ne * (SELECT n FROM nq)) DESC, vec_id LIMIT 10""",
    "p06_label_affinity" ->
      """WITH e AS (SELECT vec_id, label, CAST(UNNEST(embedding) AS DOUBLE) AS v,
                           generate_subscripts(embedding, 1) AS i FROM embeddings),
         dots AS (SELECT a.vec_id AS i1, b.vec_id AS i2, a.label AS l1, b.label AS l2,
                         SUM(a.v * b.v) AS dot,
                         SQRT(SUM(a.v * a.v)) AS na, SQRT(SUM(b.v * b.v)) AS nb
                  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
                  GROUP BY 1, 2, 3, 4)
         SELECT l1 AS label, ROUND(AVG(dot / (na * nb)), 4) + 0.0 AS avg_cosine,
                COUNT(*) AS pair_cnt
         FROM dots WHERE l1 = l2 GROUP BY l1 ORDER BY label""",
    "p14_dup_clusters" ->
      """WITH RECURSIVE
         words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                   FROM documents WHERE doc_id < 60),
         pos AS (SELECT doc_id, UNNEST(w) AS word, generate_subscripts(w, 1) AS i FROM words),
         grams AS (SELECT DISTINCT a.doc_id, a.word || ' ' || b.word AS g
                   FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
         common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
                    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
         pairs AS (SELECT d1, d2
                   FROM common JOIN sizes s1 ON d1 = s1.doc_id
                               JOIN sizes s2 ON d2 = s2.doc_id
                   WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.05),
         edges AS (SELECT d1 AS s, d2 AS t FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         reach(s, t) AS (
           SELECT doc_id, doc_id FROM documents WHERE doc_id < 60
           UNION
           SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s)
         SELECT s AS doc_id, MIN(t) AS component
         FROM reach GROUP BY s ORDER BY doc_id""",
    "p15_deterministic_mix" ->
      """SELECT lang, COUNT(*) AS kept FROM documents
         WHERE SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 4) <
           CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000'
                     WHEN 'fr' THEN '2000' ELSE '0000' END
         GROUP BY lang ORDER BY lang""",
    "p19_quantize" ->
      """WITH e AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
         s AS (SELECT vec_id, v,
                127.0 / list_max(list_transform(v, x -> abs(x))) AS sc FROM e),
         q AS (SELECT vec_id,
                list_transform(v, x -> CAST(round(x * sc) AS BIGINT)) AS qv FROM s),
         pw AS (SELECT vec_id, SUM(x * i) AS pws FROM
                  (SELECT vec_id, UNNEST(qv) AS x,
                          generate_subscripts(qv, 1) AS i FROM q)
                GROUP BY vec_id)
         SELECT q.vec_id AS vec_id, list_max(qv) AS max_q,
                list_min(qv) AS min_q,
                CAST(len(list_filter(qv, x -> x <> 0)) AS BIGINT) AS nonzero,
                CAST(pw.pws AS BIGINT) AS pos_weighted
         FROM q JOIN pw ON q.vec_id = pw.vec_id ORDER BY q.vec_id""",
    "p18_incremental_dedup" ->
      """WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                        FROM documents),
         pos AS (SELECT doc_id, UNNEST(w) AS word, generate_subscripts(w, 1) AS i FROM words),
         grams AS (SELECT DISTINCT a.doc_id, a.word || ' ' || b.word AS g
                   FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
         common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
                    FROM grams a JOIN grams b ON a.g = b.g
                     AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
                    GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 4) AS jaccard
         FROM common JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.9
         ORDER BY d1, d2""",
    // identical ground truth to p18: the index holds exactly the
    // non-batch side, and maintenance must not change a single pair
    "p40_versioned_index_dedup" ->
      """WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                        FROM documents),
         pos AS (SELECT doc_id, UNNEST(w) AS word, generate_subscripts(w, 1) AS i FROM words),
         grams AS (SELECT DISTINCT a.doc_id, a.word || ' ' || b.word AS g
                   FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
         common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
                    FROM grams a JOIN grams b ON a.g = b.g
                     AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
                    GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 4) AS jaccard
         FROM common JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.9
         ORDER BY d1, d2""",
    "p16_stratified_sample" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id, ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         WHERE rk <= 10 ORDER BY lang, doc_id""",
    "p17_contamination" ->
      """WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                        FROM documents),
         pos AS (SELECT doc_id, UNNEST(w) AS word, generate_subscripts(w, 1) AS i
                 FROM words),
         grams AS (SELECT DISTINCT a.doc_id,
                          a.word || ' ' || b.word || ' ' || c.word AS g
                   FROM pos a
                   JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                   JOIN pos c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5)
         SELECT DISTINCT doc_id FROM grams
         WHERE doc_id >= 5 AND g IN (SELECT g FROM bench)
         ORDER BY doc_id""",
    // planted colinear pairs are the only ones with cosine >= 0.999
    // (max real-real cosine ≈ 0.51 — measured over the corpus)
    "p13_embed_neardup" ->
      """SELECT vec_id AS d1, vec_id + 10000000 AS d2, 1.0 AS cosine
         FROM embeddings WHERE vec_id < 30 ORDER BY d1""",
    // exact bigram-Jaccard over all pairs (quadratic is fine for the
    // oracle; the engine side must reach the same set through LSH banding)
    "p07_minhash_lsh" ->
      """WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                        FROM documents),
         pos AS (SELECT doc_id, UNNEST(w) AS word, generate_subscripts(w, 1) AS i FROM words),
         grams AS (SELECT DISTINCT a.doc_id, a.word || ' ' || b.word AS g
                   FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
         common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
                    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 4) AS jaccard
         FROM common JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.9
         ORDER BY d1, d2""",
    // planted exact copies must be recovered at hamming 0
    "p08_simhash" ->
      """SELECT doc_id AS d1, doc_id + 10000000 AS d2, 0 AS hamming
         FROM documents WHERE doc_id < 50 ORDER BY d1""",
    // same stopword-profile scoring + (-score, lang) argmax as the engine's
    // Column expression; tie-break = first alphabetical among the maxima
    "p09_langid" ->
      """WITH toks AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
         s AS (SELECT doc_id,
           len(list_filter(t, x -> x IN ('der','die','das','und','ist','ein','zu','mit','von','nicht'))) AS de,
           len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS en,
           len(list_filter(t, x -> x IN ('el','la','los','las','y','es','un','una','de','que'))) AS es,
           len(list_filter(t, x -> x IN ('le','la','les','et','est','un','une','de','que','pour'))) AS fr,
           len(list_filter(t, x -> x IN ('的','是','了','在','我','有','和','不','人','这'))) AS zh
           FROM toks),
         pred AS (SELECT doc_id, CASE WHEN greatest(de,en,es,fr,zh) = 0 THEN 'und'
           WHEN de = greatest(de,en,es,fr,zh) THEN 'de'
           WHEN en = greatest(de,en,es,fr,zh) THEN 'en'
           WHEN es = greatest(de,en,es,fr,zh) THEN 'es'
           WHEN fr = greatest(de,en,es,fr,zh) THEN 'fr'
           ELSE 'zh' END AS lang_pred FROM s)
         SELECT doc_id, lang_pred FROM pred ORDER BY doc_id""",
    // fingerprint classes == normalized-content classes
    "p10_fingerprint" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000, upper(text) || '  ' FROM documents WHERE doc_id < 30),
         n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
               FROM corpus),
         g AS (SELECT nt, MIN(doc_id) AS grp_min, COUNT(*) AS grp_size FROM n GROUP BY nt)
         SELECT doc_id, grp_min, grp_size FROM n JOIN g USING (nt) ORDER BY doc_id""",
    // checksum classes == payload classes; 4 frames partition each payload
    "p11_multimodal" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 40),
         b AS (SELECT doc_id AS media_id,
                      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                      md5(text) AS ck FROM corpus),
         g AS (SELECT ck, MIN(media_id) AS dup_min, COUNT(*) AS dup_cnt FROM b GROUP BY ck)
         SELECT media_id, byte_len, dup_min, dup_cnt,
                CAST(4 AS BIGINT) AS n_frames, byte_len AS frame_bytes,
                (byte_len % 31) + 2 AS width,
                ((byte_len // 31) % 29) + 2 AS height,
                CAST(3 AS BIGINT) AS channels,
                ((byte_len % 31) + 2) * (((byte_len // 31) % 29) + 2) * 3 AS pixel_count,
                dup_min AS pix_min, dup_cnt AS pix_cnt
         FROM b JOIN g USING (ck) ORDER BY media_id""",
    // decoded WAV geometry recomputed from payload length; decoded
    // sample-checksum classes == payload classes
    "p36_audio_decode" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 40),
         b AS (SELECT doc_id AS media_id,
                      CAST(octet_length(encode(text)) AS BIGINT) AS len,
                      md5(text) AS ck FROM corpus),
         g AS (SELECT ck, MIN(media_id) AS dup_min, COUNT(*) AS dup_cnt
               FROM b GROUP BY ck)
         SELECT media_id,
                (len % 2) + 1 AS channels,
                CAST(16000 AS BIGINT) AS sample_rate,
                (len % 977) + 64 AS frames,
                ((len % 977) + 64) * ((len % 2) + 1) AS sample_count,
                dup_min, dup_cnt
         FROM b JOIN g USING (ck) ORDER BY media_id""",
    // the ten planted positive multiples of the query vector are the true
    // top-10 at cosine exactly 1 (max real cosine to any vector ≈ 0.51)
    "p12_ann_lsh" ->
      """SELECT CAST(10000 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(10) ORDER BY vec_id""",
    // the planted colinear set is the provable IVF answer too (same
    // construction as p12; cells cannot separate parallel vectors)
    "p20_ivf_ann" ->
      """SELECT CAST(10000 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(10) ORDER BY vec_id""",
    // batched IVF join over the p20 construction: same provable answer
    "p37_ivf_join" ->
      """SELECT CAST(10000 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(10) ORDER BY vec_id""",
    // PQ-ADC retrieval over the p12/p20 construction: the planted set is
    // provably the ADC top-10 (see the query comment), reranked exact
    "p38_pq_ann" ->
      """SELECT CAST(10000 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(10) ORDER BY vec_id""",
    // OPQ + refine: rotation keeps planted rows colinear with the
    // rotated query; the candidates=10 ADC shortlist must BE the
    // planted set and the exact re-rank reports cosine 1
    "p41_opq_refine" ->
      """SELECT CAST(10000 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(10) ORDER BY vec_id""",
    // incremental IVF-PQ: the planted batch folded into a persisted
    // index must probe back out exactly — same provable answer
    "p39_ivfpq_update" ->
      """SELECT CAST(10000 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(10) ORDER BY vec_id""",
    // planted colinear rows are the only cosine>=0.999 pairs (max real-real
    // ≈ 0.51), each must be dropped with its source as keeper at cosine 1
    "p21_semantic_dedup" ->
      """SELECT vec_id + 10000000 AS dropped, vec_id AS keeper, 1.0 AS cosine
         FROM embeddings WHERE vec_id < 30 ORDER BY dropped""",
    // SAME regex pattern strings as TextFunctions (RE2-compatible by
    // design) replayed through DuckDB: counts + redacted-text md5 agree
    "p22_pii" ->
      """WITH t AS (SELECT doc_id,
           'contact user' || doc_id || '@example.com' ||
           ' or (555) 123-4567 or 555.123.4567 or +1 555 123 4567' ||
           ' or (555)123-4567 or 1-800-555-0199' ||
           ' host 10.0.0.1 and 192.168.1.1' ||
           ' order 5551234567 ref 15551234567 ts 555-123-45678 ' ||
           text AS text
           FROM documents WHERE doc_id < 50)
         SELECT doc_id,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
           len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS ips,
           len(regexp_extract_all(text,
             '(?:\+?1[-. ])?(?:\(\b[0-9]{3}\)[-. ]?|\b[0-9]{3}[-. ])[0-9]{3}[-. ]?[0-9]{4}\b')) AS phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
             '(?:\+?1[-. ])?(?:\(\b[0-9]{3}\)[-. ]?|\b[0-9]{3}[-. ])[0-9]{3}[-. ]?[0-9]{4}\b', '[PHONE]', 'g'))
             AS redacted_md5
         FROM t ORDER BY doc_id""",
    // full list-aggregation replay of the three repetition fractions
    "p23_repetition" ->
      """WITH t AS (SELECT doc_id,
           'buy now buy now buy now click here' || chr(10) ||
           'buy now buy now buy now click here' || chr(10) ||
           text || chr(10) || 'unique tail ' || doc_id AS tt
           FROM documents),
         words AS (SELECT doc_id, regexp_split_to_array(trim(tt), '\s+') AS w
                   FROM t),
         pos AS (SELECT doc_id, UNNEST(w) AS word,
                        generate_subscripts(w, 1) AS i FROM words),
         grams AS (SELECT a.doc_id, a.word || ' ' || b.word AS g
                   FROM pos a JOIN pos b
                     ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         gstats AS (SELECT doc_id, COUNT(*) AS total,
                           COUNT(DISTINCT g) AS dst
                    FROM grams GROUP BY doc_id),
         gtop AS (SELECT doc_id, MAX(c) AS top FROM (
                    SELECT doc_id, g, COUNT(*) AS c
                    FROM grams GROUP BY doc_id, g) GROUP BY doc_id),
         lines AS (SELECT doc_id, trim(l) AS l FROM (
                     SELECT doc_id, UNNEST(string_split(tt, chr(10))) AS l
                     FROM t)
                   WHERE trim(l) <> ''),
         lstats AS (SELECT doc_id, COUNT(*) AS ltotal,
                           COUNT(DISTINCT l) AS ldst
                    FROM lines GROUP BY doc_id)
         SELECT t.doc_id,
           ROUND(1.0 - CAST(dst AS DOUBLE) / total, 4) AS dup_bigram_frac,
           ROUND(CAST(top AS DOUBLE) / total, 4) AS top_bigram_frac,
           ROUND(1.0 - CAST(ldst AS DOUBLE) / ltotal, 4) AS dup_line_frac
         FROM t JOIN gstats USING (doc_id) JOIN gtop USING (doc_id)
                JOIN lstats USING (doc_id)
         ORDER BY doc_id""",
    "p24_line_dedup" ->
      """WITH t AS (SELECT doc_id,
           text || chr(10) || 'subscribe to our newsletter today' AS tt
           FROM documents),
         ls AS (SELECT doc_id, UNNEST(string_split(tt, chr(10))) AS l,
                       generate_subscripts(string_split(tt, chr(10)), 1) AS i
                FROM t),
         common AS (SELECT regexp_replace(l, '^\s+|\s+$', '', 'g') AS tl
                    FROM ls WHERE regexp_replace(l, '^\s+|\s+$', '', 'g') <> ''
                    GROUP BY 1 HAVING COUNT(*) >= 2),
         kept AS (SELECT doc_id, l, i FROM ls
                  WHERE regexp_replace(l, '^\s+|\s+$', '', 'g') = ''
                     OR regexp_replace(l, '^\s+|\s+$', '', 'g')
                        NOT IN (SELECT tl FROM common)),
         agg AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY i) AS ct,
                        COUNT(*) AS kc
                 FROM kept GROUP BY doc_id),
         tot AS (SELECT doc_id, len(string_split(tt, chr(10))) AS n_lines
                 FROM t)
         SELECT tot.doc_id, md5(COALESCE(agg.ct, '')) AS clean_md5,
                n_lines, n_lines - COALESCE(kc, 0) AS n_removed
         FROM tot LEFT JOIN agg USING (doc_id) ORDER BY doc_id""",
    "p25_lm_quality" ->
      """WITH toks AS (SELECT doc_id,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
           FROM documents),
         nz AS (SELECT doc_id, t FROM toks WHERE t <> ''),
         model AS (SELECT t, COUNT(*) AS c FROM nz GROUP BY t),
         scal AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM model)
         SELECT doc_id, COUNT(*) AS n_tokens,
                ROUND(AVG(LN((c + 1) / (SELECT total + v FROM scal))), 4)
                  AS mean_logprob
         FROM nz JOIN model USING (t) GROUP BY doc_id ORDER BY doc_id""",
    // λ and (1−λ) are written as DOUBLE expressions so both engines
    // evaluate the SAME IEEE constants (1 − 0.7 in binary64 is
    // 0.30000000000000004; a decimal-typed 0.3 would differ at 1e-17)
    "p44_bigram_lm" ->
      """WITH words AS (SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> x <> '') AS w
           FROM documents),
         uni AS (SELECT UNNEST(w) AS t FROM words),
         um AS (SELECT t, COUNT(*) AS c FROM uni GROUP BY t),
         scal AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM um),
         bg AS (SELECT doc_id, UNNEST(generate_series(2, len(w))) AS i, w
                FROM words WHERE len(w) >= 2),
         pairs AS (SELECT doc_id, w[i-1] AS prev, w[i] AS cur FROM bg),
         bm AS (SELECT prev, cur, COUNT(*) AS bc FROM pairs
                GROUP BY prev, cur),
         model AS (SELECT bm.prev, bm.cur, bc, up.c AS cp, uc.c AS cc
                   FROM bm JOIN um up ON bm.prev = up.t
                           JOIN um uc ON bm.cur = uc.t)
         SELECT doc_id, COUNT(*) AS n_bigrams,
                ROUND(AVG(LN(CAST(0.7 AS DOUBLE) * (bc / cp)
                  + (1 - CAST(0.7 AS DOUBLE))
                    * ((cc + 1) / (SELECT total + v FROM scal)))), 4)
                  AS mean_logprob
         FROM pairs JOIN model USING (prev, cur)
         GROUP BY doc_id ORDER BY doc_id""",
    "p47_bigram_backoff" ->
      """WITH wr AS (SELECT list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> x <> '') AS w
           FROM documents WHERE doc_id % 2 = 0),
         wt AS (SELECT doc_id, list_filter(
             regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> x <> '') AS w
           FROM documents WHERE doc_id % 2 = 1),
         um AS (SELECT t, COUNT(*) AS c
                FROM (SELECT UNNEST(w) AS t FROM wr) GROUP BY t),
         scal AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM um),
         bgr AS (SELECT UNNEST(generate_series(2, len(w))) AS i, w
                 FROM wr WHERE len(w) >= 2),
         bm AS (SELECT prev, cur, COUNT(*) AS bc
                FROM (SELECT w[i-1] AS prev, w[i] AS cur FROM bgr)
                GROUP BY prev, cur),
         model AS (SELECT bm.prev, bm.cur, bc, up.c AS cp
                   FROM bm JOIN um up ON bm.prev = up.t),
         bgt AS (SELECT doc_id, UNNEST(generate_series(2, len(w))) AS i, w
                 FROM wt WHERE len(w) >= 2),
         pt AS (SELECT doc_id, w[i-1] AS prev, w[i] AS cur FROM bgt)
         SELECT doc_id, COUNT(*) AS n_bigrams,
                ROUND(AVG(LN(CAST(0.7 AS DOUBLE) * COALESCE(bc / cp, 0)
                  + (1 - CAST(0.7 AS DOUBLE))
                    * ((COALESCE(cc, 0) + 1)
                       / (SELECT total + v FROM scal)))), 4)
                  AS mean_logprob
         FROM pt LEFT JOIN model USING (prev, cur)
                 LEFT JOIN (SELECT t AS cur, c AS cc FROM um) ucur
                   USING (cur)
         GROUP BY doc_id ORDER BY doc_id""",
    "p45_sq8" ->
      """WITH dims AS (SELECT vec_id, UNNEST(embedding) AS x,
           generate_subscripts(embedding, 1) AS d FROM embeddings),
         mx AS (SELECT d, MAX(ABS(CAST(x AS DOUBLE))) / 127 AS s
                FROM dims GROUP BY d),
         q AS (SELECT vec_id, d,
                 CASE WHEN s = 0 THEN 0
                      ELSE CAST(LEAST(127, GREATEST(-127,
                             ROUND(CAST(x AS DOUBLE) / s))) AS BIGINT)
                 END AS qx
               FROM dims JOIN mx USING (d))
         SELECT vec_id, MAX(qx) AS max_q, MIN(qx) AS min_q,
                CAST(SUM(qx * d) AS BIGINT) AS pos_weighted
         FROM q GROUP BY vec_id ORDER BY vec_id""",
    "p46_tfidf_terms" ->
      """WITH toks AS (SELECT doc_id,
           UNNEST(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                              x -> x <> '')) AS t
           FROM documents),
         tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t),
         dfm AS (SELECT t, COUNT(*) AS dft FROM tf GROUP BY t),
         n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
         s AS (SELECT doc_id, t AS term,
                      ROUND(tf * LN((SELECT n FROM n) / dft), 4) AS tfidf,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY ROUND(tf * LN((SELECT n FROM n) / dft), 4)
                          DESC, t ASC) AS term_rank
               FROM tf JOIN dfm USING (t))
         SELECT doc_id, term_rank, term, tfidf FROM s WHERE term_rank <= 3
         ORDER BY doc_id, term_rank""",
    "p26_shared_spans" ->
      """WITH t AS (SELECT doc_id,
           text || ' planted shared span of exactly eight tokens' AS tt
           FROM documents WHERE doc_id < 30),
         words AS (SELECT doc_id,
                          regexp_split_to_array(trim(tt), '\s+') AS w
                   FROM t),
         idx AS (SELECT doc_id, w,
                        UNNEST(generate_series(1, len(w) - 7)) AS i
                 FROM words WHERE len(w) >= 8),
         spans AS (SELECT DISTINCT doc_id,
                          array_to_string(w[i:i+7], ' ') AS g
                   FROM idx)
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                COUNT(*) AS n_shared_spans
         FROM spans a JOIN spans b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2 ORDER BY d1, d2""",
    "p27_token_budget" ->
      """WITH d AS (SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           ROUND(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('the','a','an','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                 / len(regexp_split_to_array(trim(text), '\s+')), 6) AS score
           FROM documents),
         b AS (SELECT CAST(SUM(n_tokens) * 2 / 5 AS BIGINT) AS budget FROM d),
         s AS (SELECT doc_id, n_tokens, score,
                      CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS cum_tokens
               FROM d)
         SELECT doc_id, n_tokens, score, cum_tokens FROM s
         WHERE cum_tokens <= (SELECT budget FROM b) ORDER BY doc_id""",
    "p28_chunking" ->
      """WITH t AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents WHERE doc_id < 100),
         idx AS (SELECT doc_id, w,
                        UNNEST(generate_series(0, len(w) - 1, 16)) AS s
                 FROM t)
         SELECT doc_id, CAST(s / 16 AS INT) AS chunk_idx,
                md5(array_to_string(w[s+1 : s+24], ' ')) AS chunk_md5,
                len(w[s+1 : s+24]) AS n_chunk_tokens
         FROM idx ORDER BY doc_id, chunk_idx""",
    "p29_packing" ->
      """WITH d AS (SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS nt
           FROM documents),
         c AS (SELECT doc_id, nt,
                      CAST(SUM(nt) OVER (ORDER BY doc_id) AS BIGINT) AS cum
               FROM d)
         SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
                cum - nt AS start_tok,
                CAST(FLOOR((cum - nt) / 512.0) AS BIGINT) AS first_seq,
                CAST(FLOOR((cum - 1) / 512.0) AS BIGINT) AS last_seq
         FROM c WHERE nt > 0 ORDER BY doc_id""",
    "p43_maximal_spans" ->
      """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS i FROM documents
           WHERE doc_id < 20),
         mk AS (SELECT i,
             ['a'||i||'w0', 'a'||i||'w1', 'a'||i||'w2', 'La'||i]
               || list_transform(generate_series(0, 5 + CAST(i % 5 AS INT)),
                    k -> 'p'||i||'t'||k) AS ta,
             ['b'||i||'w0', 'b'||i||'w1', 'Rb'||i]
               || list_transform(generate_series(0, 5 + CAST(i % 5 AS INT)),
                    k -> 'p'||i||'t'||k) AS tb
           FROM ids),
         ga AS (SELECT i, UNNEST(generate_series(1, len(ta) - 5)) AS pa, ta
                FROM mk),
         gb AS (SELECT i, UNNEST(generate_series(1, len(tb) - 5)) AS pb, tb
                FROM mk),
         hits AS (SELECT a.i, a.pa - 1 AS p1, b.pb - 1 AS p2
                  FROM ga a JOIN gb b ON a.i = b.i
                    AND a.ta[a.pa : a.pa + 5] = b.tb[b.pb : b.pb + 5]),
         runs AS (SELECT i, p1 - p2 AS diag, p1, p2,
             p1 - ROW_NUMBER() OVER (PARTITION BY i, p1 - p2 ORDER BY p1)
               AS grp
           FROM hits)
         SELECT i AS d1, i + 1000 AS d2,
                CAST(MIN(p1) AS BIGINT) AS p1, CAST(MIN(p2) AS BIGINT) AS p2,
                CAST(MAX(p1) - MIN(p1) + 6 AS BIGINT) AS span_tokens
         FROM runs GROUP BY i, diag, grp ORDER BY d1, p1""",
    "p42_bpe_budget" ->
      """WITH d AS (SELECT doc_id,
           CAST(octet_length(encode(text))
             - (length(text) - length(replace(text, 'er', ''))) // 2
             - (length(text) - length(replace(text, 'th', ''))) // 2
             - (length(text) - length(replace(text, 'an', ''))) // 2
             - (length(text) - length(replace(text, 'is', ''))) // 2
             - (length(text) - length(replace(text, 'ou', ''))) // 2
             AS BIGINT) AS n_tokens
           FROM documents),
         b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) * 2 // 5 AS budget
               FROM d),
         s AS (SELECT doc_id, n_tokens,
                      CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC,
                        doc_id) AS BIGINT) AS cum_tokens
               FROM d)
         SELECT doc_id, n_tokens, cum_tokens FROM s
         WHERE cum_tokens <= (SELECT budget FROM b) ORDER BY doc_id""",
    "p30_incremental_exact" ->
      """WITH batch AS (SELECT doc_id + 1000000 AS doc_id,
           CASE WHEN doc_id % 2 = 0 THEN text
                ELSE text || ' fresh suffix' END AS text
           FROM documents WHERE doc_id < 40)
         SELECT doc_id, md5(text) AS text_hash FROM batch
         WHERE md5(text) NOT IN (SELECT md5(text) FROM documents)
         ORDER BY doc_id""",
    "p32_ann_join" ->
      """SELECT CAST(20001 + range AS BIGINT) AS query_id,
         CAST(1 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(8) ORDER BY query_id""",
    "p35_ann_index_join" ->
      """SELECT CAST(20001 + range AS BIGINT) AS query_id,
         CAST(1 + range AS BIGINT) AS vec_id, 1.0 AS cosine
         FROM range(8) ORDER BY query_id""",
    "p34_vocabulary" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
               FROM documents)
         GROUP BY token ORDER BY cnt DESC, token LIMIT 50""",
    "p33_gopher_rules" ->
      """WITH m AS (
           SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS word_count,
             CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
               x -> LENGTH(x))) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')) AS mwl,
             (len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\.\.\.'))) * 1.0
               / len(regexp_split_to_array(trim(text), '\s+')) AS sym,
             len(regexp_extract_all(text, '(?m)^\s*[-*•]')) * 1.0
               / (len(regexp_extract_all(text, '\n')) + 1) AS bullet,
             len(regexp_extract_all(text, '(?m)\.\.\.$')) * 1.0
               / (len(regexp_extract_all(text, '\n')) + 1) AS ellip
           FROM documents)
         SELECT doc_id, word_count,
           ROUND(mwl, 4) AS mean_word_len,
           ROUND(sym, 4) AS symbol_word_ratio,
           ROUND(bullet, 4) AS bullet_line_ratio,
           ROUND(ellip, 4) AS ellipsis_line_ratio,
           CAST(word_count BETWEEN 50 AND 100000
             AND mwl BETWEEN 3.0 AND 10.0
             AND sym < 0.1 AND bullet < 0.9 AND ellip < 0.3 AS INT) AS passes
         FROM m ORDER BY doc_id""",
    "p31_source_filter" ->
      """WITH scored AS (
           SELECT doc_id, source,
             CAST(ROUND(
               GREATEST(0.0, LEAST(1.0, (
                 (1.0 - ABS(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x IN ('the','a','an','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\s+')) - 0.2) * 2.0)
                 + (1.0 - ABS(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                     x -> LENGTH(x))) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\s+')) - 5.0) / 5.0)
                 + (1.0 - (LENGTH(text) - LENGTH(regexp_replace(text, '[[:punct:]]', '', 'g')))
                     / CAST(LENGTH(text) AS DOUBLE) * 5.0)) / 3.0)), 4)
               AS DECIMAL(18,4)) AS q
           FROM documents),
         per_source AS (
           SELECT source,
             ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*), 4) AS source_quality
           FROM scored GROUP BY source)
         SELECT s.doc_id, s.source, p.source_quality
         FROM scored s JOIN per_source p USING (source)
         WHERE p.source_quality >= 0.8750
         ORDER BY doc_id"""
  )
}
