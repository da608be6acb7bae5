package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // re-scanned and re-exploded three times per call
    val toks = Dedup.spread(df).select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("__t"))
      .where(col("__t") =!= "")
      .localCheckpoint()
    // the model feeds BOTH the stats collect and the scoring join —
    // un-materialized, the inverted-index-sized aggregation runs twice
    val model = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
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
