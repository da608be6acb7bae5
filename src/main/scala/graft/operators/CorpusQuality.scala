package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ckpt._

/** Corpus-relative quality scoring — the signals that need a pass over
  * the WHOLE corpus, complementing the per-row ones in
  * [[graft.functions.TextFunctions]] (stopword ratio, repetition, ...).
  */
object CorpusQuality {

  /** Unigram-LM quality score: the CCNet-style perplexity proxy
    * (arXiv:1911.00359 §3.2 scores documents with a language model and
    * filters by perplexity; a corpus-trained unigram model with add-one
    * smoothing is the deterministic, engine-replayable core of that
    * signal — documents full of rare/out-of-distribution tokens score
    * low). Tokens are lowercased whitespace tokens; smoothing
    * `ln((c + 1) / (total + V))` over corpus token count c, corpus size
    * `total`, vocabulary size `V`; a document's score is its tokens'
    * MEAN log-probability. Empty/whitespace-only/null documents yield
    * NO output row (the inner token join has nothing to aggregate) —
    * left-join the scores back to the corpus if row-parity matters.
    *
    * Scale shape: one explode + one groupBy(token) builds the model (the
    * same inverted-index shuffle every dedup op pays — map-side combined,
    * 8-byte-ish keys after dictionary compression); scoring re-joins the
    * exploded tokens against the model on the token key and aggregates
    * per document. The (total, V) scalars are a 1-row aggregate collected
    * driver-side and folded in as literals. No sampling, no RNG —
    * bit-stable across runs and engines.
    *
    * Returns (idCol, n_tokens, mean_logprob). */
  def unigramLogProbScore(df: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    // checkpoint: the exploded token table feeds the model groupBy, the
    // totals agg, AND the scoring join — without it the corpus is
    // re-scanned and re-exploded three times per call. DISK_ONLY: the
    // token table is O(total tokens) rows — LARGER than the corpus text
    // (see Ckpt's sf100 post-mortem; the memory-first unroll is the q35
    // killer at 100x)
    val toks = Dedup.spread(df).select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("__t"))
      .where(col("__t") =!= "")
      .diskCheckpoint()
    // the model feeds BOTH the stats collect and the scoring join —
    // un-materialized, the inverted-index-sized aggregation runs twice.
    // DISK_ONLY too: |vocabulary| is sublinear but UNBOUNDED at web
    // scale (billions of distinct tokens)
    val model = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
      .diskCheckpoint()
    // empty/whitespace-only corpus: sum() is null — return the empty
    // result instead of NPE-ing on getLong
    val statsRow = model.agg(sum(col("__c")), count(lit(1))).collect().head
    if (statsRow.isNullAt(0))
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          df.schema(idCol),
          org.apache.spark.sql.types.StructField("n_tokens",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("mean_logprob",
            org.apache.spark.sql.types.DoubleType))))
    val (total, v) = (statsRow.getLong(0), statsRow.getLong(1))
    toks.join(model, "__t")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log((col("__c") + 1).cast("double") /
          lit((total + v).toDouble))).as("mean_logprob"))
  }

  /** Interpolated bigram-LM document scoring against a REFERENCE corpus —
    * the next rung above [[unigramLogProbScore]] on the CCNet ladder
    * (arXiv:1911.00359 §3.2 trains a 5-gram KenLM on clean Wikipedia and
    * filters web text by its perplexity; the deterministic,
    * engine-replayable core of that signal at order 2 is a
    * reference-trained bigram model Jelinek–Mercer-interpolated with the
    * add-one unigram — Chen & Goodman 1996 eq. 3). Per target bigram
    * (prev, cur):
    * `ln(λ · c(prev,cur)/c(prev) + (1−λ) · (c(cur)+1)/(total+V))`,
    * counts from the REFERENCE; a bigram unseen there contributes only
    * the back-off term, and a token unseen there only the +1 smoothing
    * mass — so garbled/out-of-distribution target text scores LOW, the
    * CCNet separation. (Self-scoring — target and reference
    * plan-canonically identical — measures
    * context PREDICTABILITY instead: every observed bigram has
    * c(prev,cur) ≥ 1, so hapax chains score `ln(λ·1 + …)`; repeated
    * boilerplate still scores high, but one-off text is penalized only
    * where its contexts branch. The reference/target split is the
    * filtering deployment.) A document's score is the MEAN over its
    * `size−1` bigrams; documents with fewer than two tokens yield NO row.
    *
    * Scale shape: tokenization happens ONCE per corpus into per-doc
    * arrays (reference side checkpointed — it feeds the unigram explode
    * AND the bigram explode; self-scoring tokenizes once total, reusing
    * the checkpointed id-carrying table for both roles). The bigram
    * stream is built array-side
    * (`transform` over `sequence`) — no positional self-join and no
    * per-doc window, so nothing shuffles on (doc, pos). c(prev) folds
    * into the bigram model at |bigram-types| cardinality, so the
    * target-sized work is ONE left join on (prev, cur) against the
    * pre-assembled model plus one left join on the token key for the
    * back-off unigram. All aggregations are map-side combinable;
    * (total, V) are a 1-row collect folded in as literals. No sampling,
    * no RNG — bit-stable across runs and engines.
    *
    * Returns (idCol, n_bigrams, mean_logprob). */
  def bigramLogProbScoreAgainst(target: DataFrame, reference: DataFrame,
                                textCol: String, idCol: String,
                                lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1]: $lambda")
    def words(df: DataFrame, withId: Boolean) =
      Dedup.spread(df).select(
        (if (withId) Seq(col(idCol)) else Seq.empty) :+
          filter(split(trim(lower(col(textCol))), "\\s+"), t => t =!= "")
            .as("__w"): _*)
    def toPairs(w: DataFrame, keepId: Boolean) =
      w.where(size(col("__w")) >= 2).select(
        (if (keepId) Seq(col(idCol)) else Seq.empty) :+
          explode(transform(sequence(lit(2), size(col("__w"))),
            i => struct(element_at(col("__w"), i - 1).as("__prev"),
              element_at(col("__w"), i).as("__cur")))).as("__bg"): _*)
        .select((if (keepId) Seq(col(idCol)) else Seq.empty) ++
          Seq(col("__bg.__prev").as("__prev"),
            col("__bg.__cur").as("__cur")): _*)
    val selfScore = plansSameResult(target, reference)
    // feeds the unigram explode AND the bigram explode (and, when
    // self-scoring, the target pairs too — one tokenization pass total).
    // DISK_ONLY: per-doc token ARRAYS — corpus-text-scale (Ckpt policy)
    val refWords = words(reference, withId = selfScore).diskCheckpoint()
    // unigram model feeds the scalar collect, the model fold, and the
    // back-off join; |vocabulary| rows — unbounded at web scale
    val uni = refWords.select(explode(col("__w")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
      .diskCheckpoint()
    val statsRow = uni.agg(sum(col("__c")), count(lit(1))).collect().head
    if (statsRow.isNullAt(0))
      return target.sparkSession.createDataFrame(
        target.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          target.schema(idCol),
          org.apache.spark.sql.types.StructField("n_bigrams",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("mean_logprob",
            org.apache.spark.sql.types.DoubleType))))
    val (total, v) = (statsRow.getLong(0), statsRow.getLong(1))
    val bi = toPairs(refWords, keepId = false)
      .groupBy("__prev", "__cur").agg(count(lit(1)).as("__bc"))
    // fold c(prev) in at |bigram-types| cardinality — the target-sized
    // join below then touches ONE model table for the bigram term
    val model = bi.join(
      uni.select(col("__t").as("__prev"), col("__c").as("__cp")), "__prev")
    val pairs = toPairs(
      if (selfScore) refWords else words(target, withId = true),
      keepId = true)
    pairs
      .join(model, Seq("__prev", "__cur"), "left")
      .join(uni.select(col("__t").as("__cur"), col("__c").as("__cc")),
        Seq("__cur"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log(lit(lambda) * coalesce(
          col("__bc").cast("double") / col("__cp"), lit(0.0)) +
          lit(1.0 - lambda) * ((coalesce(col("__cc"), lit(0L)) + 1)
            .cast("double") / lit((total + v).toDouble))))
          .as("mean_logprob"))
  }

  /** Self-score detection by CANONICALIZED PLAN, not object identity
    * (r19 verdict: `target eq reference` missed logically-identical
    * DataFrames — e.g. two `df.select(...)` wrappers over the same
    * table — and double-tokenized them; `sameResult` compares the
    * canonicalized analyzed plans, which normalize attribute ids and
    * commutative operand order, so any pair Catalyst can PROVE
    * result-identical takes the single-tokenization path). Plans
    * Catalyst cannot prove equal — e.g. one side re-read through a
    * different scan — fall back to the two-pass reference/target path,
    * which is semantically identical, just one tokenization slower. */
  private[operators] def plansSameResult(a: DataFrame, b: DataFrame): Boolean =
    a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed)

  /** Self-scored form of [[bigramLogProbScoreAgainst]] (model trained on
    * `df` itself — the oracle-replayable gate surface; see the
    * predictability caveat there). */
  def bigramLogProbScore(df: DataFrame, textCol: String, idCol: String,
                         lambda: Double = 0.7): DataFrame =
    bigramLogProbScoreAgainst(df, df, textCol, idCol, lambda)

  /** Top-k TF-IDF terms per document — keyword extraction / topic
    * fingerprinting for corpus curation (the classic tf·idf weighting,
    * Salton & Buckley 1988): `tfidf = tf(doc, t) · ln(N / df(t))` over
    * the same lowercased whitespace tokens the LM scores use. The score
    * is rounded to 4 dp BEFORE ranking so the rank order is
    * engine-replayable (two terms within float noise of each other tie
    * at 4 dp and break on the term text — deterministic at any
    * parallelism and identical in the SQL replay; ranking raw doubles
    * would let a 1-ulp `ln` difference swap neighbors). Empty documents
    * yield no rows.
    *
    * Scale shape: one explode + one map-side-combined groupBy(doc, term)
    * builds the tf table (checkpointed — it feeds the N count, the
    * document-frequency aggregate, AND the scoring join); df(t)
    * aggregates tf at |vocabulary| cardinality; the scoring join is
    * tf ⋈ df on the term key; the top-k window partitions by document
    * (per-doc vocabulary sized — thousands of partitionable keys, never
    * a global sort). N is the count of documents WITH TOKENS, derived
    * from the already-materialized tf table — NOT an extra corpus scan
    * (r19 verdict: the old `df.count()` burned a full input pass per
    * call; a token-free document contributes no tf rows and receives no
    * output rows anyway, so excluding it from N is the standard "N =
    * documents in the index" idf convention and costs one narrow
    * checkpoint read instead of a corpus job).
    *
    * Returns (idCol, term_rank, term, tfidf). */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    // N rides the tf checkpoint job via observe() (r21, VERDICT r20 #6 /
    // guide §1.2): the old `tf.select(id).distinct.count()` re-scanned
    // the whole O(doc × distinct-term) checkpoint and shuffled a
    // distinct just to count documents. BEFORE the explode every
    // document is exactly ONE row, so "documents with tokens" is a
    // plain conditional count on the token array — no distinct needed —
    // and CollectMetrics evaluates it while the checkpoint job
    // materializes the blocks (same mechanism as the CC convergence
    // probe). Identical N for unique ids (the documented contract: one
    // row per document); null/empty/whitespace-only docs count in
    // neither form (explode of an empty array emitted no row; size of
    // null is not > 0).
    val obs = new org.apache.spark.sql.Observation("tfidf_n_docs")
    // checkpoint storage = Ckpt policy: O(doc x distinct-term) rows
    val tf = Dedup.spread(df)
      .select(col(idCol),
        filter(split(trim(lower(col(textCol))), "\\s+"),
          t => t =!= "").as("__toks"))
      .observe(obs,
        count(when(size(col("__toks")) > 0, 1)).as("n_docs"))
      .select(col(idCol), explode(col("__toks")).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("tf"))
      .diskCheckpoint()
    val n = obs.get("n_docs").asInstanceOf[Long]
    val dfm = tf.groupBy("__t").agg(count(lit(1)).as("__dft"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("__t").asc)
    tf.join(dfm, "__t")
      .withColumn("tfidf",
        round(col("tf") * log(lit(n.toDouble) / col("__dft")), 4))
      .withColumn("term_rank", row_number().over(w))
      .where(col("term_rank") <= topK)
      .select(col(idCol), col("term_rank"), col("__t").as("term"),
        col("tfidf"))
  }

  /** Corpus vocabulary: the top-k most frequent word tokens with counts —
    * tokenizer-training corpus prep (BPE seeds from exactly this table)
    * and boilerplate/contamination analysis. One explode over the
    * codegen'd alnum tokenizer + one map-side-combined groupBy on the
    * token string; the global top-k rides orderBy+limit (TakeOrdered —
    * no full-sort shuffle). Ties break on the token text, so the cut at
    * `topK` is deterministic at any parallelism. */
  def vocabulary(df: DataFrame, textCol: String, topK: Int): DataFrame =
    df.select(explode(
        graft.functions.TextFunctions.wordTokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topK)

  /** Domain/source-level filtering (Gopher arXiv:2112.11446 App. A and
    * RefinedWeb arXiv:2306.01116 §3.1 curate at the SOURCE level on top
    * of per-document filters — a spammy domain poisons all its pages,
    * including the individually-plausible ones): aggregate a
    * per-document quality `score` (any Column, e.g.
    * [[graft.functions.TextFunctions.qualityScore]]) by source and keep
    * documents whose source's MEAN score clears `minSourceScore`.
    *
    * Scale shape: one map-side-combined groupBy(source) over the
    * codegen'd score — the aggregate output is |sources| rows (domains,
    * not documents) — broadcast back onto the document table, which
    * therefore never shuffles. The mean is summed in DECIMAL of the
    * 4-dp-rounded score, so it is exact and order-independent at any
    * parallelism (a double sum's value would depend on partitioning).
    *
    * Returns the surviving documents with their source's
    * `source_quality` appended. Documents whose `sourceCol` is NULL are
    * EXCLUDED (standard equi-join semantics, matching the SQL replay —
    * there is no source to attribute quality to; `coalesce` the column
    * to a sentinel first to pool them as their own source). The mean is
    * over SCORED documents (null scores are excluded from numerator AND
    * denominator — dividing by the total row count dragged a source's
    * mean toward zero for every unscoreable document). */
  def filterBySourceQuality(df: DataFrame,
                            score: org.apache.spark.sql.Column,
                            sourceCol: String,
                            minSourceScore: Double): DataFrame = {
    val scored = df.withColumn("__q",
      round(score, 4).cast(org.apache.spark.sql.types.DecimalType(18, 4)))
    val perSource = scored.groupBy(col(sourceCol)).agg(
      round(sum(col("__q")).cast("double") / count(col("__q")), 4)
        .as("source_quality"))
    scored.drop("__q").join(
      broadcast(perSource.where(col("source_quality") >= minSourceScore)),
      Seq(sourceCol))
  }
}
