package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeHandle

/** Tokenizer-exact BPE token count (GPT-2 merges.txt format) — codegen'd
  * Catalyst expression; the generated code calls through a tiny
  * serializable handle ([[graft.functions.BpeHandle]]) that lazy-loads
  * the compiled model ONCE per executor JVM keyed by path, so the task
  * binary carries two strings, never the ~50k-merge table. */
final case class BpeTokenCountExpr(child: Expression, mergesPath: String)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  @transient private lazy val handle = new BpeHandle(mergesPath, "")

  override protected def nullSafeEval(input: Any): Any =
    handle.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("bpeHandle", handle,
      "graft.functions.BpeHandle")
    defineCodeGen(ctx, ev, c => s"$h.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full BPE encoding to vocab ids (GPT-2 merges.txt + vocab.json) —
  * array<int> of token ids. Inconsistent model files (a merged symbol
  * the vocab does not cover) fail LOUDLY per row — that is a
  * deterministic configuration error, not data noise. */
final case class BpeEncodeExpr(child: Expression, mergesPath: String,
                               vocabPath: String)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.string(child.dataType, prettyName)

  @transient private lazy val handle = new BpeHandle(mergesPath, vocabPath)

  override protected def nullSafeEval(input: Any): Any =
    handle.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("bpeHandle", handle,
      "graft.functions.BpeHandle")
    defineCodeGen(ctx, ev, c => s"$h.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
