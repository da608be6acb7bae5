package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row text functions:
  * whole-stage-codegen'd (doGenCode emits a static call — no UDF
  * serialization, no codegen break in the pipeline). Preference order per
  * the engine's design: compose built-ins > custom Expression > UDF; these
  * two are pure string→long kernels that built-ins can't express.
  */
abstract class StringHashExpression extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  /** Fully-qualified static kernel, e.g. "graft.expressions.Kernels.fnv". */
  def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernel($c)")
}

/** FNV-1a 64-bit fingerprint over normalized (lowercased,
  * whitespace-collapsed) content — codegen form of
  * TextFunctions.fingerprint. */
final case class FnvFingerprint(child: Expression) extends StringHashExpression {
  override def kernel: String = "graft.expressions.Kernels.fnvFingerprint"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.fnvFingerprint(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fnv_fingerprint"
}

/** 64-bit SimHash over whitespace tokens — codegen form of
  * TextFunctions.simhash64. */
final case class SimHash64(child: Expression) extends StringHashExpression {
  override def kernel: String = "graft.expressions.Kernels.simhash64"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Static kernels referenced from generated code (must be public static —
  * hence the object's Java-facing methods). */
object Kernels {
  def fnvFingerprint(s: UTF8String): Long = {
    // Locale.ROOT: default-locale toLowerCase is JVM-environment-
    // dependent (tr locale dots/undots 'i'), which would give the SAME
    // document DIFFERENT fingerprints across clusters/runs — fatal for
    // dedup joins keyed on the fingerprint
    val normalized = s.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.replaceAll("\\s+", " ")
    var h = 0xcbf29ce484222325L
    val bytes = normalized.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  def simhash64(s: UTF8String): Long = {
    val counts = new Array[Int](64)
    s.toString.split("\\s+").foreach { tok =>
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
}

/** SQL-function registration (the SparkSessionExtensions-style hook):
  * `GraftFunctions.register(spark)` exposes `fnv_fingerprint(str)` and
  * `simhash64(str)` to SQL slots and `expr(...)`. */
object GraftFunctions {
  private def arity1(name: String)(build: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(one) => build(one)
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name,
        "expectedNum" -> "1", "actualNum" -> other.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
  }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fnv_fingerprint" -> arity1("fnv_fingerprint")(FnvFingerprint(_)),
    "simhash64" -> arity1("simhash64")(SimHash64(_)))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.expressions", name),
      builder)
  }
}
