package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Analysis-time input validation shared by the kernel expressions. The
  * replaced Column compositions cast their inputs; a raw Expression reads
  * ArrayData bytes directly, so a wrong-typed child (array<int> into a
  * float/double kernel) would misread 4-byte ints as floats at runtime.
  * These checks surface that as an AnalysisException instead. */
private[expressions] object ExprTypeChecks {
  def numericArray(dt: DataType, expr: String, arg: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$expr requires $arg to be array<float> or array<double>, got ${other.catalogString}")
  }
  def doubleArrayArray(dt: DataType, expr: String, arg: String): TypeCheckResult = dt match {
    case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$expr requires $arg to be array<array<double>>, got ${other.catalogString}")
  }
  def doubleArray(dt: DataType, expr: String, arg: String): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$expr requires $arg to be array<double>, got ${other.catalogString}")
  }
  def longArray(dt: DataType, expr: String, arg: String): TypeCheckResult = dt match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$expr requires $arg to be array<bigint>, got ${other.catalogString}")
  }
  def string(dt: DataType, expr: String): TypeCheckResult = dt match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$expr requires a string input, got ${other.catalogString}")
  }
}

/** Native Catalyst expressions for the hot per-row VECTOR kernels.
  *
  * Why these exist: Spark's higher-order array functions (`zip_with`,
  * `aggregate`, `transform`) are CodegenFallback — every element op is an
  * interpreted lambda call with boxing. For an O(dim) cosine that's
  * tolerable; for the O(k·dim) IVF centroid-assignment argmax it
  * dominated the build (measured: k=256 over 20k×64-dim vectors spent
  * ~25 s per Lloyd pass in lambda evaluation). These expressions emit a
  * static kernel call inside whole-stage codegen: tight `while` loops
  * over ArrayData, no boxing, no virtual dispatch.
  *
  * Arithmetic is ORDER-IDENTICAL to the Column compositions they replace
  * (left-to-right per-element accumulation, separate accumulators, first
  * index wins ties), so results are bit-for-bit equal and the DuckDB
  * oracles / stored indexes are unaffected.
  */

/** Exact cosine similarity between two numeric-array columns
  * (float or double elements; result double). Replaces
  * `aggregate(zip_with(a,b,*))/(sqrt(aggregate(...))*sqrt(...))` —
  * ONE pass, three accumulators, same element order → same doubles.
  *
  * Mismatched lengths yield NULL, matching the replaced composition
  * (zip_with null-pads the shorter side; the null products propagate
  * through `aggregate` to a null sum). A ragged/malformed embedding is
  * therefore filtered by similarity thresholds, never scored. */
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.numericArray(left.dataType, prettyName, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.numericArray(right.dataType, prettyName, "right")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // A zero-norm (or NaN-carrying) vector has UNDEFINED cosine — the raw
  // division yields NaN, and Spark's NaN-is-largest ordering would rank
  // such a vector ABOVE every real match and pass every >= threshold
  // (a zero embedding would be flagged as a near-dup of its whole
  // bucket). Undefined similarity surfaces as NULL, which thresholds
  // and orderings reject.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    if (ad.numElements() != bd.numElements()) null
    else {
      val c = VectorKernels.cosine(ad, bd, isFloat(left), isFloat(right))
      if (java.lang.Double.isNaN(c)) null else c
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.VectorKernels.cosine(
         |    $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |  if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index (0-based) of the centroid with the max dot product against a
  * vector: `argmax_i cents[i]·vec` over array<array<double>> ×
  * array<double>. Replaces
  * `array_position(scores, array_max(scores)) - 1` over a
  * `transform(cents, aggregate(zip_with(...)))` score array — the IVF
  * Lloyd-pass hot loop. First max wins ties, matching array_position.
  * A NaN dot is treated as greater than any other score (Spark's
  * `array_max` NaN ordering) with the first NaN winning — pinned by
  * VectorExpressionsSuite's NaN case. */
final case class ArgMaxDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "argmax_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.doubleArrayArray(left.dataType, prettyName, "centroids")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.doubleArray(right.dataType, prettyName, "vector")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.argMaxDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorKernels.argMaxDot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane sign signature: `planes` bits packed into a long,
  * bit p = sign of vec·h_p where h_p's components are ±1 derived from
  * Spark's xxhash64. Replaces the per-plane
  * `aggregate(zip_with(vec, sequence, x*planeComponent))` composition —
  * O(planes·dim) interpreted lambdas per row, THE cost of every LSH
  * signature build. Hash semantics replicate the Column form exactly
  * (XXH64.hashInt chained with seed 42, sign-preserving `% 2 == 0`), so
  * signatures — and therefore buckets — are bit-identical. */
final case class PlaneSig(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  // the signature packs one bit per plane into a long; past 64 the
  // shift wraps mod 64 and planes silently alias onto low bits
  require(planes >= 1 && planes <= 64,
    s"planes must be in [1, 64] (one signature bit per plane), got $planes")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "plane_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.numericArray(child.dataType, prettyName, "input")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.planeSignature(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorKernels.planeSignature($c, $planes, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unit-normalized (double) copy of a numeric-array column; zero vectors
  * pass through unscaled. Replaces the `aggregate(...)` + `transform`
  * finish-lambda composition feeding the IVF build — same arithmetic
  * (sum of squares left-to-right, per-element x/sqrt(ss)). */
final case class UnitVec(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unit_vec"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.numericArray(child.dataType, prettyName, "input")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.unitVec(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorKernels.unitVec($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dense matrix × vector: `out[i] = Σ_j M[i][j]·v[j]` over
  * array<array<double>> × array<double>. The OPQ rotation kernel
  * ([[graft.operators.Pq.trainOpq]]): the learned orthogonal rotation
  * rides as ONE flat plan literal (dim² doubles — 32 KB at dim 64) and
  * every vector rotates in a single codegen'd pass before PQ encode /
  * ADC-table build. NULL when any matrix row's length differs from the
  * vector's (a ragged embedding must not silently half-rotate — the
  * [[CosineSim]] mismatch contract) or the matrix is empty. */
final case class MatVec(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mat_vec"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.doubleArrayArray(left.dataType, prettyName, "matrix")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.doubleArray(right.dataType, prettyName, "vector")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.matVec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.expressions.VectorKernels.matVec($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Element-wise vector difference `a − b` over double arrays — the
  * residual kernel of the IVF-PQ residual formulation
  * ([[graft.operators.Pq]]: r = u − centroid(cell), quantized instead
  * of u). NULL on a length mismatch (a ragged embedding must not
  * silently truncate, the [[MatVec]] contract). */
final case class SubVec(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sub_vec"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = ExprTypeChecks.doubleArray(left.dataType, prettyName, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else ExprTypeChecks.doubleArray(right.dataType, prettyName, "right")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.subVec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.expressions.VectorKernels.subVec($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 quantization of a numeric-array column — kernel form
  * of Similarity.quantizeInt8's aggregate/transform composition: one
  * pass finds max|x|, a second emits round(x·scale) as ints.
  * scale = 127/max|x| (0.0 for all-zero vectors), rounding replicates
  * Spark's `round(double)` exactly (BigDecimal.valueOf → HALF_UP).
  * Returns struct(scale double, q array<int>).
  *
  * NaN components propagate into max|x| (the replaced `greatest` treats
  * NaN as the largest double) so scale = NaN — a malformed vector is
  * visibly poisoned, not silently quantized. Documented divergence: the
  * composition's final `round(NaN).cast("int")` raises under ANSI mode;
  * the kernel emits 0 for each component instead (Java NaN→int
  * narrowing), pinned by VectorExpressionsSuite's NaN case. */
final case class QuantizeInt8Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("q",
      ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes(): TypeCheckResult =
    ExprTypeChecks.numericArray(child.dataType, prettyName, "input")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.quantizeInt8(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorKernels.quantizeInt8($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernels referenced from generated code. */
object VectorKernels {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Bit p = (vec · h_p >= 0); h_p component j = +1 iff
    * xxhash64(p, j) % 2 == 0 — the exact semantics of the Column form
    * `xxhash64(lit(p), j)` (XXH64.hashInt chained from seed 42, Spark's
    * sign-preserving remainder). */
  def planeSignature(vec: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      val seedP = XXH64.hashInt(p, 42L)
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        dot += (if (XXH64.hashInt(j, seedP) % 2 == 0) x else -x)
        j += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Dense mat×vec, row-major left-to-right accumulation (the driver
    * twin in [[graft.operators.Pq.PqCodebook.tableFor]] calls THIS
    * kernel, so driver- and executor-side rotations are bit-equal).
    * Null on empty matrix or any row-length mismatch. */
  def matVec(m: ArrayData, v: ArrayData): ArrayData = {
    val rows = m.numElements()
    if (rows == 0) return null
    val n = v.numElements()
    val vv = v.toDoubleArray()
    val out = new Array[Double](rows)
    var i = 0
    while (i < rows) {
      val row = m.getArray(i)
      if (row.numElements() != n) return null
      var acc = 0.0
      var j = 0
      while (j < n) { acc += row.getDouble(j) * vv(j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** x_i / sqrt(Σx²) with the zero-vector passthrough; accumulation and
    * division order match the aggregate/transform composition. */
  def unitVec(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      out(i) = x; ss += x * x; i += 1
    }
    if (ss != 0.0) {
      val nrm = math.sqrt(ss)
      var j = 0
      while (j < n) { out(j) = out(j) / nrm; j += 1 }
    }
    new GenericArrayData(out)
  }

  /** Cosine with per-side element-type flags (constant-folded by JIT —
    * the branches hoist out of the loop). Accumulation order matches the
    * zip_with/aggregate composition exactly: x·y, x², y² summed
    * left-to-right in separate accumulators. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** a − b element-wise over double arrays; null on length mismatch. */
  def subVec(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Spark `round(double)` (scale 0): BigDecimal.valueOf → HALF_UP, with
    * the NaN/Infinity passthrough RoundBase has. */
  private def round0(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def quantizeInt8(vec: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val a = math.abs(x)
      // NaN-as-largest, matching the replaced `greatest`: once maxAbs is
      // NaN it stays NaN (a > NaN is false, and a non-NaN a never resets)
      if (a > maxAbs || java.lang.Double.isNaN(a)) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else 127.0 / maxAbs
    val out = new Array[Int](n)
    var j = 0
    while (j < n) {
      val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      out(j) = round0(x * scale).toInt
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(out)))
  }

  /** First-max argmax of centroid·vec dot products (strict `>` keeps the
    * first index on ties, = array_position(scores, array_max(scores))).
    * A NaN dot counts as the largest score (Spark's array_max ordering),
    * first NaN winning — a valid index is always returned. */
  def argMaxDot(cents: ArrayData, vec: ArrayData): Int = {
    val v = vec.toDoubleArray()
    val k = cents.numElements()
    var best = Double.NegativeInfinity
    var bestI = 0
    var i = 0
    while (i < k) {
      val c = cents.getArray(i)
      val n = math.min(c.numElements(), v.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += c.getDouble(j) * v(j); j += 1 }
      if ((dot > best && !java.lang.Double.isNaN(best)) ||
          (java.lang.Double.isNaN(dot) && !java.lang.Double.isNaN(best))) {
        best = dot; bestI = i
      }
      i += 1
    }
    bestI
  }
}
