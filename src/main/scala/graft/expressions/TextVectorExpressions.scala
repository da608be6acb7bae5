package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernel for the word-n-gram sliding window — the expression
  * every text-dedup signature build explodes (MinHash shingles, n-gram
  * Jaccard inverted index, SimHash tokens, repetition stats). The Column
  * composition it replaces (`transform(sequence(...), i => concat_ws(" ",
  * slice(words, i, n)))` over `split(trim(text), "\s+")`) is
  * CodegenFallback: O(tokens·n) interpreted lambda calls per document.
  *
  * Semantics replicate the composition EXACTLY (pinned by
  * TextVectorExpressionsSuite against the inlined original, including the
  * edge cases):
  * - SQL `trim` strips SPACES only (U+0020) — a trailing `\n` or `\t`
  *   survives and yields a trailing empty token, exactly as before;
  * - `split(s, "\s+")` is Java `Pattern.split(s, -1)` — leading
  *   separators yield a leading empty token;
  * - n == 1 returns the token array itself; fewer than n tokens returns
  *   an EMPTY array (the `sequence(1, 0)` descending-range guard).
  */
final case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-row MinHash signature: k min-hash draws over the document's
  * word-n-gram multiset, computed in ONE pass per row. Replaces the
  * explode(shingles) → xxhash64 → groupBy(id).agg(k mins) pipeline in
  * Dedup.minhashSignatures — the explode materialized every gram string
  * as a row and pushed k affine transforms through a two-phase
  * aggregation; as a scalar expression the signature build is a narrow
  * projection with NO shuffle at all.
  *
  * Signature VALUES are identical to the pipeline form: same gram
  * strings (WordNgramsExpr tokenization), same
  * `pmod(xxhash64(gram), P)` base hash (XXH64 over the gram's UTF-8
  * bytes, seed 42), same splitmix64-derived affine permutations
  * `(a_i·h + b_i) mod P`, and min over the multiset equals min over the
  * distinct set (array_distinct dropped duplicates; duplicates cannot
  * change a min). Documents with no grams return NULL — the pipeline
  * form simply had no rows for them after the explode, so callers filter
  * `isNotNull` to keep the row set identical. */
final case class MinHashSig(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1 && shingleN >= 1)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.minhashSig(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel returns null for gramless docs — null-guard the result
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expressions.TextVectorKernels.minhashSig(
            ${c.value}, $k, $shingleN);
          ${ev.isNull} = (${ev.value} == null);
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature derived from a document's RAW 64-bit gram hashes
  * (the [[HashedGramsExpr]] array) instead of its text — the one-pass
  * fusion of the dedup signature+gram build (r20): every LSH pipeline
  * that needs BOTH tables used to tokenize and XXH64-hash the corpus
  * text twice (once inside [[MinHashSig]], once inside
  * [[HashedGramsExpr]]); deriving the signature from the already-hashed
  * gram array removes the second full tokenize+hash pass.
  *
  * Signature values are IDENTICAL to [[MinHashSig]] over the same text:
  * both reduce each gram to `pmod(xxhash64(gram), P)` and take k affine
  * mins, and the min over the DISTINCT gram-hash set equals the min over
  * the gram multiset (duplicates cannot change a min — the same
  * equivalence [[MinHashSig]]'s doc documents vs the historical
  * explode+array_distinct pipeline). Input order is irrelevant for the
  * same reason. Empty arrays return NULL, matching [[MinHashSig]] on
  * gramless docs (equivalence pinned in TextVectorExpressionsSuite). */
final case class MinHashSigFromHashes(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig_from_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.longArray(child.dataType, prettyName, "input")

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.minhashSigFromHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel returns null for empty arrays — null-guard the result
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expressions.TextVectorKernels.minhashSigFromHashes(
            ${c.value}, $k);
          ${ev.isNull} = (${ev.value} == null);
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SORTED DISTINCT 64-bit gram hashes of a document: the verify-join
  * representation of its word-n-gram set. Semantics = the Column
  * composition `array_sort(array_distinct(transform(wordNgrams(text, n),
  * g => xxhash64(g))))` (XXH64 over each gram's UTF-8 bytes, Spark's
  * default seed 42), computed in ONE pass per row.
  *
  * Why hashes instead of gram strings (VERDICT r7 #1): the exact-Jaccard
  * verify join ships each candidate doc's full gram array per PAIR — at
  * soak scale that payload (gram strings, ~doc length each side) and
  * `array_intersect`'s per-pair hash-set build over UTF8Strings dominated
  * p07 (~40 s while the kernelized signature build was ~1 s). Hashed sets
  * are 8 bytes/gram, and sorted arrays intersect by a branchy merge
  * ([[SortedIntersectCount]]) with zero allocation. Jaccard over the
  * hashed sets equals Jaccard over the string sets unless two DISTINCT
  * grams of one document collide in 64 bits (per-pair probability
  * ~2⁻⁶⁴; a corpus-wide miscount needs a collision within a single
  * document's ~10³ grams — ~10⁻¹³ per doc). Docs too short to form one
  * gram yield an EMPTY array, matching wordNgrams. */
final case class HashedGramsExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.hashedGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.hashedGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positional (ordered, NOT deduped) n-gram hashes — [[HashedGramsExpr]]
  * minus the sort/dedup, so array index == token position. Seed table
  * for variable-length shared-span detection (Dedup.maximalSharedSpans):
  * a span shared at positions (p1, p2) seeds a hit at EVERY window
  * offset inside it, and those hits are what the diagonal-run merge
  * coalesces back into one maximal span. */
final case class PositionalGramsExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "positional_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.positionalGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.positionalGramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection SIZE of two SORTED distinct long arrays — the verify-join
  * kernel pairing [[HashedGramsExpr]]: a single merge pass, no per-pair
  * allocation. Equals `size(array_intersect(a, b))` when both inputs are
  * sorted sets (array_intersect on unsorted/duplicated inputs has
  * first-occurrence semantics this kernel does not replicate). */
final case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.longArray(left.dataType, prettyName, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.longArray(right.dataType, prettyName, "right")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextVectorKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextVectorKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two EQUAL-LENGTH long arrays agree — the
  * MinHash estimated-Jaccard kernel: est J = eqCount / k. Replaces the
  * `size(filter(zip_with(a, b, eq), identity))` composition, which
  * allocates two intermediate 64-element arrays per compared pair —
  * at 10⁷+ candidate pairs the allocation churn made the ESTIMATE-only
  * path slower than the exact gram verify (100× soak: 121 s vs 47 s).
  * One fused loop, zero allocation. Arrays of unequal length compare
  * over the common prefix (callers always pass same-k signatures). */
final case class PositionalEqCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "positional_eq_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.longArray(left.dataType, prettyName, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.longArray(right.dataType, prettyName, "right")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextVectorKernels.positionalEqCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextVectorKernels.positionalEqCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All ordered pairs (i < j positions) of a SORTED distinct long array,
  * as array<struct<d1,d2>> — the in-bucket candidate-pair emission of the
  * collected-bucket dedup shape. Replaces the
  * `transform(s, (x,i) => transform(slice(s, i+2, ...), y => struct(x,y)))`
  * + flatten composition, which is CodegenFallback (O(m²) interpreted
  * lambda calls per bucket); emission order (i asc, then j asc) and the
  * d1 < d2 invariant are identical. Output length m(m−1)/2 — callers
  * bound m with their bucket-size guards; the expression itself refuses
  * arrays whose pair count would overflow. */
final case class SortedLongPairs(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("d1",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("d2",
      org.apache.spark.sql.types.LongType, nullable = false))) match {
    case st => ArrayType(st, containsNull = false)
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_long_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.longArray(child.dataType, prettyName, "input")

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.sortedLongPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.sortedLongPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All i<j position pairs of a SORTED array<struct<id:long, fp:long>> as
  * array<struct<d1,d2,hamming>> with hamming = bit_count(fp1 XOR fp2) —
  * the SimHash collected-bucket pair emission ([[SortedLongPairs]]'s
  * struct sibling). Replaces the nested transform/slice/flatten + struct
  * getField + bit_count composition, which is CodegenFallback (O(m²)
  * interpreted lambda calls per bucket). Emission order (i asc, then j
  * asc over the sorted list), the d1 <= d2 invariant, and the hamming
  * arithmetic are identical; the caller's self-pair filter and
  * bucket-size guard are unchanged. */
final case class SortedIdFpPairs(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = {
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("d1",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("d2",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("hamming",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    ArrayType(st, containsNull = false)
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_id_fp_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StructType(fields), _)
        if fields.length == 2 &&
          fields.forall(_.dataType == org.apache.spark.sql.types.LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.sortedIdFpPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.sortedIdFpPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fraction of whitespace tokens that are stopwords — kernel form of
  * `size(filter(tokens, isin(stopwords))) / size(tokens)` (the filter
  * lambda is interpreted per token; quality scoring is the FIRST pass of
  * a curation pipeline, so the per-token tax runs over the whole
  * corpus). Same ints divided in double → same result. */
final case class StopwordRatioExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stopword_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.stopwordRatio(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: Janino's generics support is partial
    val setRef = ctx.addReferenceObj("stopwordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.stopwordRatio($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Mean token length in characters — kernel form of
  * `aggregate(transform(tokens, length), 0, +) / size(tokens)`.
  * Lengths are UTF8String.numChars summed as Int, divided in double —
  * matching the composition exactly. */
final case class MeanTokenLenExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mean_token_len"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.meanTokenLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.meanTokenLen($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stopword-profile language ID — kernel form of the per-language
  * `size(filter(tokens, isin(profile)))` scores + (-score, lang)
  * struct-sort argmax: languages are scored over LOWERCASED tokens,
  * the best strictly-greater score wins with alphabetical tie-break,
  * and a zero best yields "und". `profiles` must arrive sorted by
  * language code (TextFunctions.langId sorts before constructing). */
final case class LangIdExpr(child: Expression,
                            profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  @transient private lazy val compiled: Array[(UTF8String, java.util.HashSet[UTF8String])] =
    profiles.map { case (lang, words) =>
      val s = new java.util.HashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      (UTF8String.fromString(lang), s)
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.langId(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langProfiles", compiled,
      "scala.Tuple2[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.langId($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextVectorKernels {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  private val MersennePrime = 2147483647L // 2^31 - 1

  private val Und = UTF8String.fromString("und")

  /** SQL-trim (spaces only) + Java Pattern.split(-1) token array — the
    * exact tokens of `split(trim(text), "\s+")`. */
  private def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    Whitespace.split(s.substring(lo, hi), -1)
  }

  def stopwordRatio(text: UTF8String, stopwords: java.util.HashSet[UTF8String]): Double = {
    val toks = tokenize(text)
    var hits = 0
    var i = 0
    while (i < toks.length) {
      if (stopwords.contains(UTF8String.fromString(toks(i)))) hits += 1
      i += 1
    }
    hits.toDouble / toks.length.toDouble
  }

  def meanTokenLen(text: UTF8String): Double = {
    val toks = tokenize(text)
    var sum = 0 // Int accumulation, matching aggregate's lit(0) seed
    var i = 0
    while (i < toks.length) {
      sum += UTF8String.fromString(toks(i)).numChars()
      i += 1
    }
    sum.toDouble / toks.length.toDouble
  }

  /** Tokens are lowercased BEFORE splitting (the composition is
    * `tokens(lower(text))`) — lowercase via UTF8String.toLowerCase to
    * match Spark's `lower`. */
  def langId(text: UTF8String,
             profiles: Array[(UTF8String, java.util.HashSet[UTF8String])]): UTF8String = {
    val toks = tokenize(text.toLowerCase)
    var bestLang: UTF8String = null
    var bestScore = 0
    var p = 0
    while (p < profiles.length) {
      val set = profiles(p)._2
      var score = 0
      var i = 0
      while (i < toks.length) {
        if (set.contains(UTF8String.fromString(toks(i)))) score += 1
        i += 1
      }
      // strict > keeps the alphabetically-first language on ties
      // (profiles arrive sorted by code)
      if (score > bestScore) { bestScore = score; bestLang = profiles(p)._1 }
      p += 1
    }
    if (bestScore == 0) Und else bestLang
  }

  /** splitmix64 finalizer — MUST stay identical to Dedup.minhashSignatures'
    * historical a_i/b_i derivation (signatures are bucketing keys). */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** (a_i, b_i) affine coefficients per k, memoized (k is a literal per
    * expression — one entry per distinct k in practice). */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, kk => {
      val a = new Array[Long](kk); val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        a(i) = java.lang.Math.floorMod(mix(i.toLong), MersennePrime - 1) + 1
        b(i) = java.lang.Math.floorMod(mix(i.toLong + 7919), MersennePrime)
        i += 1
      }
      (a, b)
    })

  /** k-min signature over the doc's n-gram multiset; null when the doc is
    * too short to form a single gram (the explode form had no rows). */
  def minhashSig(text: UTF8String, k: Int, n: Int): ArrayData = {
    val grams = wordNgrams(text, n)
    val m = grams.numElements()
    if (m == 0) return null
    val (a, b) = coeffs(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var g = 0
    while (g < m) {
      val gram = grams.getUTF8String(g)
      // pmod(xxhash64(gram), P): Spark's XxHash64 over the UTF-8 bytes,
      // seed 42, then sign-safe mod
      val raw = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        gram.getBaseObject, gram.getBaseOffset, gram.numBytes, 42L)
      val h = java.lang.Math.floorMod(raw, MersennePrime)
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % MersennePrime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  /** k-min signature from RAW xxhash64 gram hashes — [[minhashSig]] with
    * the tokenize+hash pass already done (see [[MinHashSigFromHashes]]):
    * same `floorMod(raw, P)` reduction, same affine permutations, null
    * for empty inputs. Values are bit-identical to [[minhashSig]] over
    * the text the hashes came from. */
  def minhashSigFromHashes(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return null
    val (a, b) = coeffs(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var g = 0
    while (g < m) {
      val h = java.lang.Math.floorMod(hashes.getLong(g), MersennePrime)
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % MersennePrime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  /** POSITIONAL xxhash64 gram hashes: hs(i) = hash of the n-gram starting
    * at token position i, in token order, neither sorted nor deduped —
    * the seed table for maximal-shared-span detection (position i must
    * be recoverable from the array index). Same tokenization, gram
    * construction, and hash (seed 42) as [[hashedGrams]]. */
  def positionalGramHashes(text: UTF8String, n: Int): ArrayData = {
    val grams = wordNgrams(text, n)
    val m = grams.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val g = grams.getUTF8String(i)
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** Sorted distinct xxhash64 (seed 42, Spark's `xxhash64`) values of the
    * doc's word n-grams — see [[HashedGramsExpr]]. */
  def hashedGrams(text: UTF8String, n: Int): ArrayData = {
    val grams = wordNgrams(text, n)
    val m = grams.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val g = grams.getUTF8String(i)
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < m) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** i<j position pairs of a sorted long array — see [[SortedLongPairs]]. */
  def sortedLongPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n.toLong * (n - 1) / 2
    require(m <= Int.MaxValue, s"pair explosion of $n ids overflows")
    val out = new Array[AnyRef](m.toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](x, a.getLong(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** i<j position pairs of a sorted (id, fp) struct array with inline
    * hamming — see [[SortedIdFpPairs]]. */
  def sortedIdFpPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n.toLong * (n - 1) / 2
    require(m <= Int.MaxValue, s"pair explosion of $n ids overflows")
    // unpack once: getStruct on every inner-loop probe would re-decode
    val ids = new Array[Long](n)
    val fps = new Array[Long](n)
    var t = 0
    while (t < n) {
      val r = a.getStruct(t, 2)
      ids(t) = r.getLong(0)
      fps(t) = r.getLong(1)
      t += 1
    }
    val out = new Array[AnyRef](m.toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](ids(i), ids(j),
            java.lang.Long.bitCount(fps(i) ^ fps(j))))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Position-wise equality count over the common prefix — see
    * [[PositionalEqCount]]. */
  def positionalEqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Merge-count of two sorted distinct long arrays — see
    * [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** trim(' ') + Pattern.split(-1) + sliding mkString(" ") — the exact
    * token/gram strings of the Column composition. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    // SQL trim: spaces only (NOT Java String.trim, which eats all <= 0x20)
    val s = text.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = s.substring(lo, hi)
    val words = Whitespace.split(trimmed, -1)
    if (n == 1) {
      val out = new Array[AnyRef](words.length)
      var i = 0
      while (i < words.length) { out(i) = UTF8String.fromString(words(i)); i += 1 }
      new GenericArrayData(out)
    } else if (words.length >= n) {
      val m = words.length - n + 1
      val out = new Array[AnyRef](m)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(new Array[AnyRef](0))
  }
}
