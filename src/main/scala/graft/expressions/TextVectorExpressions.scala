package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

  override protected def nullSafeEval(input: Any): Any =
    TextVectorKernels.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextVectorKernels.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextVectorKernels {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

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
