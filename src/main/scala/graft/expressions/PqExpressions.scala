package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (see [[graft.operators.Pq]]).
  *
  * PQ splits a d-dim vector into `m` sub-vectors and quantizes each
  * against its own `k`-centroid codebook, collapsing the vector to `m`
  * bytes — the memory story that keeps a 100-TB embedding corpus
  * probe-able from RAM (64-dim float = 256 B → 8 B codes, 32×). Queries
  * never decode: ADC (asymmetric distance computation) pre-computes the
  * m×k table of query-to-centroid distances once per query, then scores
  * any code with m table lookups.
  *
  * All three kernels are native codegen expressions for the same reason
  * as [[VectorExpressions]]: `transform`/`aggregate` lambdas are
  * CodegenFallback, and encode is an O(k·dim) per-row loop (the IVF
  * assignment cost) while ADC scoring is THE per-candidate hot loop of
  * every PQ query. Ties break to the first (lowest) index everywhere;
  * NaN distances lose to any real distance — deterministic codes on
  * every run/cluster.
  */

private[expressions] object PqTypeChecks {
  def tripleDoubleArray(dt: DataType, expr: String, arg: String): TypeCheckResult = dt match {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$expr requires $arg to be array<array<array<double>>>, got ${other.catalogString}")
  }
}

/** Index (0-based) of the centroid with the MINIMUM squared-L2 distance
  * to a vector: `argmin_i Σ_j (cents[i][j] - vec[j])²` over
  * array<array<double>> × array<double>. The Euclidean counterpart of
  * [[ArgMaxDot]] (k-means assignment uses L2, not dot — sub-vectors of a
  * unit vector are not themselves unit). First min wins ties; a NaN
  * distance loses to any real distance (first-NaN wins only when every
  * distance is NaN), so a valid index is always returned. */
final case class ArgMinL2(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "argmin_l2"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.doubleArrayArray(left.dataType, prettyName, "centroids")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.doubleArray(right.dataType, prettyName, "vector")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.argMinL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.PqKernels.argMinL2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ encode: codebook [m][k][subDim] × vector → binary code of m bytes,
  * byte s = argmin_j L2²(vec_sub(s), cents[s][j]) (sub-vector s =
  * vec[Σ subDim(0..s-1) ..]). Yields NULL when the vector's length does
  * not equal the codebook's total sub-dimension (a ragged embedding is
  * filtered by downstream null handling, never mis-encoded — the
  * [[CosineSim]] length-mismatch contract). k ≤ 256 enforced by the
  * operator ([[graft.operators.Pq.train]]); bytes store the index
  * unsigned (`& 0xFF` on read). */
final case class PqEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = PqTypeChecks.tripleDoubleArray(left.dataType, prettyName, "codebook")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.doubleArray(right.dataType, prettyName, "vector")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.pqEncode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.expressions.PqKernels.pqEncode($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ADC lookup table for one query: codebook [m][k][subDim] × query
  * vector → flat array<double> of m·k squared-L2 distances, entry
  * s·k + j = L2²(q_sub(s), cents[s][j]). Computed ONCE per query (the
  * O(k·dim) part), after which every candidate code scores in m lookups
  * ([[PqAdcExpr]]). NULL on query/codebook dimension mismatch. */
final case class PqTableExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_table"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = PqTypeChecks.tripleDoubleArray(left.dataType, prettyName, "codebook")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.doubleArray(right.dataType, prettyName, "query")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.pqTable(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.expressions.PqKernels.pqTable($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ADC score: flat m·k distance table × m-byte code → Σ_s
  * table[s·k + code[s]] (squared L2 between the query and the code's
  * reconstruction). `k` rides as a literal — the table alone cannot
  * disambiguate m×k. NULL when the table length ≠ code length × k
  * (a code from a DIFFERENT codebook must not silently mis-score). */
final case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with Serializable {
  require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.doubleArray(left.dataType, prettyName, "table")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else right.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires code to be binary, got ${other.catalogString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = PqKernels.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]], k)
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.expressions.PqKernels.pqAdc($a, $b, $k);
         |if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernels referenced from generated code. */
object PqKernels {

  /** First-min argmin of squared-L2 distances (strict `<` keeps the
    * first index on ties). NaN loses: a NaN distance never replaces a
    * real best (NaN < x is false), and a real distance always replaces
    * a NaN best. */
  def argMinL2(cents: ArrayData, vec: ArrayData): Int = {
    val v = vec.toDoubleArray()
    val k = cents.numElements()
    var best = Double.NaN
    var bestI = 0
    var i = 0
    while (i < k) {
      val c = cents.getArray(i)
      val n = math.min(c.numElements(), v.length)
      var d = 0.0
      var j = 0
      while (j < n) { val t = c.getDouble(j) - v(j); d += t * t; j += 1 }
      if (d < best || java.lang.Double.isNaN(best)) { best = d; bestI = i }
      i += 1
    }
    bestI
  }

  /** m-byte PQ code; null when the vector length ≠ Σ subDims. */
  def pqEncode(cb: ArrayData, vec: ArrayData): Array[Byte] = {
    val v = vec.toDoubleArray()
    val m = cb.numElements()
    val out = new Array[Byte](m)
    var off = 0
    var s = 0
    while (s < m) {
      val cents = cb.getArray(s) // [k][subDim]
      val k = cents.numElements()
      val subDim = if (k == 0) 0 else cents.getArray(0).numElements()
      if (off + subDim > v.length) return null
      var best = Double.NaN
      var bestI = 0
      var i = 0
      while (i < k) {
        val c = cents.getArray(i)
        var d = 0.0
        var j = 0
        val n = math.min(c.numElements(), subDim)
        while (j < n) { val t = c.getDouble(j) - v(off + j); d += t * t; j += 1 }
        if (d < best || java.lang.Double.isNaN(best)) { best = d; bestI = i }
        i += 1
      }
      out(s) = bestI.toByte
      off += subDim
      s += 1
    }
    if (off != v.length) null else out
  }

  /** Flat m·k squared-L2 table; null on dimension mismatch. */
  def pqTable(cb: ArrayData, vec: ArrayData): ArrayData = {
    val v = vec.toDoubleArray()
    val m = cb.numElements()
    if (m == 0) return null
    val k = cb.getArray(0).numElements()
    val out = new Array[Double](m * k)
    var off = 0
    var s = 0
    while (s < m) {
      val cents = cb.getArray(s)
      if (cents.numElements() != k) return null
      val subDim = if (k == 0) 0 else cents.getArray(0).numElements()
      if (off + subDim > v.length) return null
      var i = 0
      while (i < k) {
        val c = cents.getArray(i)
        var d = 0.0
        var j = 0
        val n = math.min(c.numElements(), subDim)
        while (j < n) { val t = c.getDouble(j) - v(off + j); d += t * t; j += 1 }
        out(s * k + i) = d
        i += 1
      }
      off += subDim
      s += 1
    }
    if (off != v.length) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Σ_s table[s·k + code[s]]; NaN (→ NULL at the expression) when the
    * table does not match the code's m×k geometry. */
  def pqAdc(table: ArrayData, code: Array[Byte], k: Int): Double = {
    val m = code.length
    if (table.numElements() != m * k) return Double.NaN
    var sum = 0.0
    var s = 0
    while (s < m) {
      val j = code(s) & 0xFF
      if (j >= k) return Double.NaN
      sum += table.getDouble(s * k + j)
      s += 1
    }
    sum
  }
}
