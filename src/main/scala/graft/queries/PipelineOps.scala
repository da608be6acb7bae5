package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Multimodal, Similarity}

/** Training-data pipeline operators over the `documents` / `embeddings`
  * tables. SQL-expressible ops carry DuckDB oracles; LSH/fingerprint ops
  * (hash functions differ engine-to-engine by construction) are rows-only
  * here and exact-verified in ScalaTest with planted duplicates.
  */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def queryVec(s: SparkSession, dir: String): Seq[Float] =
    embs(s, dir).where(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup by content digest (shuffle key = 16-byte md5)
    "p01_exact_dedup" -> ((s, dir) => {
      Dedup.exactDedup(docs(s, dir), "text", "doc_id")
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

    // ---- label-centroid cosine structure: avg pairwise dot per label pair
    "p06_label_affinity" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("label"), col("embedding"))
      val a = e.select(col("vec_id").as("i1"), col("label").as("l1"), col("embedding").as("v1"))
      val b = e.select(col("vec_id").as("i2"), col("label").as("l2"), col("embedding").as("v2"))
      a.join(b, col("i1") < col("i2"))
        .where(col("l1") === col("l2")) // within-label affinity
        .groupBy(col("l1").as("label"))
        // +0.0 normalizes IEEE negative zero out of the rounded result
        .agg((round(avg(Similarity.cosine(col("v1"), col("v2"))), 4) + lit(0.0))
               .as("avg_cosine"),
             count(lit(1)).as("pair_cnt"))
        .orderBy("label")
    }),

    // ---- MinHash+LSH near-dup candidates (rows-only: hash engine-specific).
    // Bounded doc subset: the synthetic corpus shares one tiny vocabulary,
    // so unigram-shingle similarity is globally high — unbounded input would
    // make every LSH bucket near-universal (see maxBucketSize in Dedup).
    "p07_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(docs(s, dir).where(col("doc_id") < 500),
          "text", "doc_id", k = 64, bands = 16, shingleN = 1,
          minEstJaccard = 0.8, maxBucketSize = 600)
        .orderBy("d1", "d2")
    }),

    // ---- SimHash near-dup candidates (rows-only)
    "p08_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(docs(s, dir), "text", "doc_id", maxHamming = 10)
        .orderBy("d1", "d2")
    }),

    // ---- language-ID distribution (rows-only: heuristic)
    "p09_langid" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), langId(col("text")).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("cnt"))
        .orderBy("lang_pred")
    }),

    // ---- document fingerprints (rows-only: FNV is ours, not DuckDB's)
    "p10_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // ---- multimodal plumbing: pack → batch feature extract (rows-only)
    "p11_multimodal" -> ((s, dir) => {
      val media = Multimodal.packAsMedia(docs(s, dir), "doc_id", "text")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("byte_len"), col("checksum"))
        .orderBy("media_id")
    }),

    // ---- ANN via random-hyperplane LSH bucket + exact rerank (rows-only)
    "p12_ann_lsh" -> ((s, dir) => {
      Similarity.lshTopK(embs(s, dir).where(col("vec_id") =!= 0),
          "embedding", "vec_id", queryVec(s, dir), k = 10, planes = 6)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
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

    // ---- embedding near-dup pairs above cosine threshold (oracle-able)
    "p13_embed_neardup" -> ((s, dir) => {
      val e = embs(s, dir)
      val a = e.select(col("vec_id").as("d1"), col("embedding").as("v1"))
      val b = e.select(col("vec_id").as("d2"), col("embedding").as("v2"))
      a.join(b, col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          Similarity.cosine(col("v1"), col("v2")).as("c"))
        .where(col("c") >= 0.5)
        .select(col("d1"), col("d2"), round(col("c"), 4).as("cosine"))
        .orderBy("d1", "d2")
    })
  )

  val oracles: Map[String, String] = Map(
    "p01_exact_dedup" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
         FROM documents GROUP BY md5(text) ORDER BY doc_id""",
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
      """WITH words AS (SELECT doc_id, string_split(trim(text), ' ') AS w
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
         words AS (SELECT doc_id, string_split(trim(text), ' ') AS w
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
    "p13_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v,
                           generate_subscripts(embedding, 1) AS i FROM embeddings),
         dots AS (SELECT a.vec_id AS d1, b.vec_id AS d2, SUM(a.v * b.v) AS dot,
                         SQRT(SUM(a.v * a.v)) AS na, SQRT(SUM(b.v * b.v)) AS nb
                  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
                  GROUP BY 1, 2)
         SELECT d1, d2, ROUND(dot / (na * nb), 4) AS cosine
         FROM dots WHERE dot / (na * nb) >= 0.5 ORDER BY d1, d2"""
  )
}
