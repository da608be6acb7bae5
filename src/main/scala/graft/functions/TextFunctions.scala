package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * Everything here is a Catalyst `Column` expression (codegen'd, no UDF)
  * except langId/simhash/fingerprint, which are narrow per-row scalar UDFs
  * (O(doc length), embarrassingly parallel — no shuffle, no state).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word-ish tokens by regex (the "BPE-ish" pre-tokenizer pass). */
  def wordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Cheap byte-pair-encoding token-count estimate (~4 chars/token) —
    * fine for FILTERING; use [[bpeTokenCount]] when the budget must be
    * tokenizer-exact (training-mix assembly). */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** Tokenizer-EXACT token count: a loadable BPE model (GPT-2
    * `merges.txt` format) applied by a codegen'd Catalyst expression —
    * the real count the packing/budget operators
    * (`Sampling.takeByTokenBudget`, `Packing.packSequences`,
    * `Packing.chunkDocuments`) should budget with when assembling a
    * training mix (`bpeTokenEstimate` mis-sizes a budget by ±20% on
    * natural text). Executors load the model once per JVM from
    * `mergesPath` (any Hadoop-visible FS); the plan ships only the
    * path. */
  def bpeTokenCount(text: Column, mergesPath: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.BpeTokenCountExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text), mergesPath))

  /** Full BPE encoding to vocab ids (`merges.txt` + `vocab.json`,
    * GPT-2 format): array<int> token ids, e.g. for exact-length
    * sequence packing or token-level dedup. */
  def bpeEncode(text: Column, mergesPath: String, vocabPath: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.BpeEncodeExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        mergesPath, vocabPath))

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are stopwords (quality signal) — codegen'd
    * kernel ([[graft.expressions.StopwordRatioExpr]]); the
    * size(filter(isin)) composition it replaces paid an interpreted
    * lambda per token on the curation pipeline's first pass. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.StopwordRatioExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text), stopwords))

  /** Mean token length (quality signal) — codegen'd kernel
    * ([[graft.expressions.MeanTokenLenExpr]]), same Int length sum /
    * double division as the aggregate/transform composition. */
  def meanTokenLength(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.MeanTokenLenExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double") / length(text).cast("double")

  /** Composite quality score in [0,1]: favors moderate stopword density,
    * word lengths in the natural-language band, low punctuation noise. */
  def qualityScore(text: Column): Column = {
    val sw = stopwordRatio(text)
    val mt = meanTokenLength(text)
    val pr = punctRatio(text)
    val swScore = lit(1.0) - abs(sw - lit(0.2)) * 2.0
    val mtScore = lit(1.0) - abs(mt - lit(5.0)) / 5.0
    val prScore = lit(1.0) - pr * 5.0
    greatest(lit(0.0), least(lit(1.0), (swScore + mtScore + prScore) / 3.0))
  }

  /** Gopher-style document-quality rule bundle (arXiv:2112.11446
    * Table A1 — the heuristic filters corpus curation applies before any
    * model-based scoring): word-count bounds, mean-word-length band,
    * symbol-to-word ratio (`#`/`...`), bullet-start and ellipsis-end
    * line ratios. Composed from the codegen'd token kernels plus
    * `regexp_count` — no per-token lambdas, no UDFs, one projection over
    * the corpus. Returns a struct of the metrics and an overall
    * `passes` flag (1/0; INT so the value stringifies identically across
    * engines). Patterns are RE2-compatible so the oracle replays them
    * verbatim. */
  def gopherRules(text: Column): Column = {
    val wc = tokenCount(text)
    val mwl = meanTokenLength(text)
    val lines = regexp_count(text, lit("\n")) + lit(1)
    val sym = (regexp_count(text, lit("#")) +
        regexp_count(text, lit("\\.\\.\\."))).cast("double") /
      when(wc === 0, lit(null)).otherwise(wc).cast("double")
    val bullet = regexp_count(text, lit("(?m)^\\s*[-*•]")).cast("double") /
      lines.cast("double")
    val ellip = regexp_count(text, lit("(?m)\\.\\.\\.$")).cast("double") /
      lines.cast("double")
    val passes = wc.between(50, 100000) && mwl.between(3.0, 10.0) &&
      sym < 0.1 && bullet < 0.9 && ellip < 0.3
    struct(
      wc.as("word_count"),
      round(mwl, 4).as("mean_word_len"),
      round(sym, 4).as("symbol_word_ratio"),
      round(bullet, 4).as("bullet_line_ratio"),
      round(ellip, 4).as("ellipsis_line_ratio"),
      passes.cast("int").as("passes"))
  }

  /** Word n-grams WITH duplicates (1-based sliding window) — the input to
    * repetition-quality stats, where multiplicity is the signal. Contrast
    * Dedup.shingles, which wraps this in array_distinct for set-Jaccard —
    * this is the ONE sliding-window expression both share (a drifted copy
    * would silently change bucketing between the dedup paths). Short docs
    * yield an empty array. Backed by the codegen'd
    * [[graft.expressions.WordNgramsExpr]] kernel: the transform/slice/
    * concat_ws composition it replaces is CodegenFallback — O(tokens·n)
    * interpreted lambdas per document on THE path every dedup signature
    * build explodes; token/gram strings are replicated exactly
    * (equivalence-pinned in TextVectorExpressionsSuite). */
  def wordNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.WordNgramsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  // ---- repetition-quality stats (Gopher/C4-style filters) ---------------
  // Raw Measurement Quality signals over REPEATED content: curation
  // pipelines drop a doc whose duplicate-n-gram or duplicate-line mass is
  // high BEFORE anything semantic runs (Rae et al. 2021, arXiv:2112.11446
  // §A1.1 "repetition removal"; C4's three-sentence dedup). All pure
  // Column expressions — per-row, codegen'd, no shuffle at 100TB.

  /** Fraction of n-gram OCCURRENCES that are repeats of an earlier gram:
    * 1 − distinct/total. 0.0 for docs too short to form a single gram. */
  def duplicateNgramFraction(text: Column, n: Int): Column = {
    val grams = wordNgrams(text, n)
    when(size(grams) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast("double")
        / size(grams).cast("double"))
  }

  /** Fraction of all n-gram occurrences taken by the single most frequent
    * gram — an occurrence-fraction APPROXIMATION of Gopher's "top n-gram
    * fraction" (Rae et al. 2021 define the metric over the fraction of
    * CHARACTERS covered by the top gram; thresholds tuned against the
    * paper need re-calibration for this variant). O(n log n) per row:
    * sort the grams, then ONE `aggregate` pass finds the longest equal
    * run — equal grams are adjacent after the sort, so the max run length
    * IS the max multiplicity. (The obvious
    * `transform(distinct, g => count(grams, ==g))` shape is
    * O(distinct·total) per row — 10⁸–10¹⁰ string comparisons on the
    * 10⁴–10⁵-token docs repetition filters exist to catch, a
    * straggler-task generator.) Row-local, embarrassingly parallel, no
    * shuffle. 0.0 for gram-less docs. */
  def topNgramFraction(text: Column, n: Int): Column = {
    val grams = wordNgrams(text, n)
    val best = aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(grams) === 0, lit(0.0)).otherwise(
      best.cast("double") / size(grams).cast("double"))
  }

  /** Fraction of non-empty LINES that are exact repeats of an earlier line
    * (whitespace-trimmed). The paragraph variant is the same expression
    * over a different separator. 0.0 for line-less docs. */
  def duplicateLineFraction(text: Column, sep: String = "\n"): Column = {
    val lines = filter(transform(split(text, java.util.regex.Pattern.quote(sep)),
      l => trim(l)), l => l =!= "")
    when(size(lines) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(lines)).cast("double")
        / size(lines).cast("double"))
  }

  // ---- PII detection / redaction ---------------------------------------
  // Patterns are deliberately RE2-compatible (no backreferences, no
  // lookaround) so the SAME pattern string runs identically under Java
  // regex (Spark) and RE2 (DuckDB/the oracle) — engine-portable semantics.

  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Regex = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** NANP phone numbers in the common written forms: `555-123-4567`,
    * `(555) 123-4567`, `(555)123-4567`, `555.123.4567`, `555 123 4567`,
    * each with an optional `+1` / `1` country prefix. The area code must
    * be marked — either parenthesized or followed by a `-`/`.`/space
    * separator; the separator between exchange and line number is
    * OPTIONAL once the area code is marked (`555-1234567` matches,
    * `(555)1234567` matches). Bare 10/11-digit runs are left alone (too
    * many false positives: ids, timestamps, order keys). `\b` anchors
    * block half-matches inside longer digit runs on both ends. */
  val PhoneRegex =
    "(?:\\+?1[-. ])?(?:\\(\\b[0-9]{3}\\)[-. ]?|\\b[0-9]{3}[-. ])[0-9]{3}[-. ]?[0-9]{4}\\b"

  /** Occurrence counts of the three PII pattern families (codegen'd
    * regexp_count — no UDF). */
  def piiEmailCount(text: Column): Column = regexp_count(text, lit(EmailRegex))
  def piiIpCount(text: Column): Column = regexp_count(text, lit(Ipv4Regex))
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(PhoneRegex))

  /** Redact PII in place: emails first (their local parts contain digits
    * and dots that the narrower patterns could half-match), then IPv4,
    * then phone numbers. Pure regexp_replace chain — one projection, no
    * shuffle, safe to run over 100TB of text. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRegex, "[EMAIL]"),
        Ipv4Regex, "[IP]"),
      PhoneRegex, "[PHONE]")

  // ---- scalar UDF zone -------------------------------------------------

  /** Tiny per-language stopword/particle profiles for the n-gram-free
    * language-ID heuristic. Deterministic, driver-independent. */
  val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "zh" -> Set("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Heuristic language ID: stopword-profile voting with deterministic
    * alphabetic tie-break; "und" (undetermined) when nothing scores.
    * Scala-function form, kept as the semantic spec for tests. */
  val langIdF: String => String = { text =>
    val toks = text.toLowerCase.split("\\s+").toSeq
    val scores = langProfiles.map { case (lang, words) =>
      lang -> toks.count(words.contains)
    }
    val best = scores.filter(_._2 > 0)
    if (best.isEmpty) "und"
    else best.toSeq.sortBy { case (l, s) => (-s, l) }.head._1
  }

  /** Column form of [[langIdF]] — the codegen'd
    * [[graft.expressions.LangIdExpr]] kernel: per-language
    * token-multiplicity scores over lowercased tokens, argmax with the
    * same (-score, lang) tie-break the historical struct-sort
    * composition used (profiles passed sorted by code; strict-greater
    * keeps the alphabetically-first language on ties), "und" when
    * nothing scores. */
  def langId(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.LangIdExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        langProfiles.toSeq.sortBy(_._1).map { case (l, ws) => (l, ws.toSeq) }))

  /** 64-bit SimHash over whitespace tokens: per-token 64-bit hash votes
    * ±1 on each bit; the sign vector is the fingerprint. Near-dup docs
    * differ in few bits (small hamming distance). */
  val simhash64F: String => Long = { text =>
    val counts = new Array[Int](64)
    text.split("\\s+").foreach { tok =>
      val h1 = scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c).toLong
      val h2 = scala.util.hashing.MurmurHash3.stringHash(tok, 0x85ebca6b).toLong
      val h = (h1 << 32) | (h2 & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  def simhash64(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.SimHash64(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** FNV-1a 64-bit rolling document fingerprint over normalized
    * (lowercased, whitespace-collapsed) content. */
  val fingerprintF: String => Long = { text =>
    val normalized = text.toLowerCase.trim.replaceAll("\\s+", " ")
    var h = 0xcbf29ce484222325L
    normalized.getBytes("UTF-8").foreach { b =>
      h ^= (b & 0xffL); h *= 0x100000001b3L
    }
    h
  }
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.FnvFingerprint(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
