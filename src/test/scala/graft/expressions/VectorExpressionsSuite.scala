package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The codegen'd vector kernels claim BIT-IDENTICAL results to the
  * higher-order-function compositions they replaced — this suite asserts
  * that claim directly by evaluating both forms side by side (the old
  * compositions are inlined here as the spec). */
class VectorExpressionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("vector-expr-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def bridge = org.apache.spark.sql.GraftColumnBridge

  /** A float-vector corpus with negatives, zeros, a zero vector, and
    * magnitude spread. */
  private def vecs = {
    val sp = spark; import sp.implicits._
    Seq(
      (0L, Seq(1.0f, 2.0f, -3.0f, 0.5f)),
      (1L, Seq(-0.1f, 0.0f, 7.25f, -2.5f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(1e-4f, -1e4f, 3.3f, 2.7f)),
      (4L, Seq(42.0f, 0.125f, -0.25f, 9.9f))
    ).toDF("id", "v")
  }

  // ---- the replaced compositions, inlined as the executable spec -------
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  private def cosineOld(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))
  private def planeSigOld(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val comp = (i: Column) =>
        when(xxhash64(lit(p), i) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
      val dotP = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * comp(i)),
        lit(0.0), (acc, x) => acc + x)
      when(dotP >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
  private def unitOld(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"),
      ss => transform(vec, x =>
        when(ss === 0.0, x.cast("double")).otherwise(x.cast("double") / sqrt(ss))))

  test("CosineSim is bit-identical to the zip_with/aggregate composition") {
    val rows = vecs.as("a").crossJoin(vecs.as("b"))
      .where(col("a.id") =!= 2 && col("b.id") =!= 2) // zero vector → NaN both ways
      .select(
        bridge.column(CosineSim(
          bridge.expression(col("a.v")), bridge.expression(col("b.v")))).as("k"),
        cosineOld(col("a.v"), col("b.v")).as("o"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows.length == 16)
  }

  test("PlaneSig is bit-identical to the per-plane hash composition") {
    Seq(1, 6, 8, 17, 63).foreach { planes =>
      val rows = vecs.select(
        bridge.column(PlaneSig(bridge.expression(col("v")), planes)).as("k"),
        planeSigOld(col("v"), planes).as("o")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"planes=$planes"))
    }
  }

  test("UnitVec matches the aggregate/transform composition elementwise") {
    val rows = vecs.select(
      bridge.column(UnitVec(bridge.expression(col("v")))).as("k"),
      unitOld(col("v")).as("o")).collect()
    rows.foreach { r =>
      val (k, o) = (r.getSeq[Double](0), r.getSeq[Double](1))
      assert(k.length == o.length)
      k.zip(o).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y))
      }
    }
  }

  test("QuantizeInt8Expr equals the aggregate/transform composition") {
    // old composition inlined as the spec (max|x| bound in FINISH lambda)
    def quantOld(vec: Column): Column =
      aggregate(vec, lit(0.0),
        (acc, x) => greatest(acc, abs(x.cast("double"))),
        maxAbs => {
          val scale = when(maxAbs === 0.0, lit(0.0))
            .otherwise(lit(127.0) / maxAbs)
          struct(scale.as("scale"),
            transform(vec, x => round(x.cast("double") * scale).cast("int"))
              .as("q"))
        })
    val rows = vecs.select(
      bridge.column(QuantizeInt8Expr(bridge.expression(col("v")))).as("k"),
      quantOld(col("v")).as("o")).collect()
    rows.foreach { r =>
      val (k, o) = (r.getStruct(0), r.getStruct(1))
      assert(java.lang.Double.doubleToLongBits(k.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(o.getDouble(0)))
      assert(k.getSeq[Int](1) == o.getSeq[Int](1))
    }
    // half-away-from-zero pinned on exact .5 products
    val sp = spark; import sp.implicits._
    val half = Seq(Seq(2.0f, 1.0f)).toDF("v") // scale 63.5 → 1*63.5 = 63.5
      .select(bridge.column(QuantizeInt8Expr(bridge.expression(col("v")))).as("k"))
      .collect().head.getStruct(0).getSeq[Int](1)
    assert(half == Seq(127, 64)) // 63.5 rounds HALF_UP to 64
  }

  test("CosineSim yields NULL (not NaN) for zero-norm vectors") {
    val sp = spark; import sp.implicits._
    // documented divergence from the raw-division composition: its NaN
    // ranks ABOVE every real cosine under Spark's NaN-is-largest
    // ordering and passes every >= threshold, so a zero embedding would
    // be flagged as a near-dup of its whole bucket; undefined
    // similarity surfaces as NULL, which thresholds reject
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (2L, Seq(1.0f, 2.0f), Seq(0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      bridge.column(CosineSim(
        bridge.expression(col("a")), bridge.expression(col("b")))).as("k"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(1) == 1.0)
    // the threshold filter rejects the undefined rows
    val kept = df.select(col("id"),
      bridge.column(CosineSim(
        bridge.expression(col("a")), bridge.expression(col("b")))).as("k"))
      .where(col("k") >= 0.9).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L), s"zero-norm row passed a threshold: $kept")
  }

  test("PlaneSig rejects plane counts past the 64-bit signature") {
    val sp = spark; import sp.implicits._
    val e = intercept[IllegalArgumentException](
      graft.operators.Similarity.planeSignature(col("v"), planes = 96))
    assert(e.getMessage.contains("64"))
  }

  test("CosineSim yields NULL on mismatched lengths, like the composition") {
    val sp = spark; import sp.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val rows = df.select(
      bridge.column(CosineSim(
        bridge.expression(col("a")), bridge.expression(col("b")))).as("k"),
      cosineOld(col("a"), col("b")).as("o")).collect()
    assert(rows.head.isNullAt(0), "kernel must return null on ragged input")
    assert(rows.head.isNullAt(1), "composition spec returns null on ragged input")
  }

  test("QuantizeInt8Expr propagates NaN into scale (greatest NaN-as-largest)") {
    val sp = spark; import sp.implicits._
    val r = Seq(Seq(Float.NaN, 2.0f, -1.0f)).toDF("v")
      .select(bridge.column(QuantizeInt8Expr(bridge.expression(col("v")))).as("k"))
      .collect().head.getStruct(0)
    assert(java.lang.Double.isNaN(r.getDouble(0)),
      "NaN component must poison the scale, not be ignored")
    // documented divergence: components emit 0 (NaN→int narrowing) where
    // the ANSI-mode composition would raise on the cast
    assert(r.getSeq[Int](1) == Seq(0, 0, 0))
  }

  test("ArgMaxDot treats a NaN dot as the largest score, first NaN wins") {
    val sp = spark; import sp.implicits._
    val cents = Seq(Seq(5.0, 0.0), Seq(Double.NaN, 0.0), Seq(Double.NaN, 1.0))
    val rows = Seq(Seq(1.0, 1.0)).toDF("u")
      .withColumn("cents", typedLit(cents))
      .select(bridge.column(ArgMaxDot(
        bridge.expression(col("cents")), bridge.expression(col("u")))).as("k"))
      .collect()
    assert(rows.head.getInt(0) == 1, "first NaN dot must win over finite scores")
  }

  test("wrong-typed inputs fail at analysis time, not runtime") {
    val sp = spark; import sp.implicits._
    val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(bridge.column(CosineSim(
        bridge.expression(col("a")), bridge.expression(col("b"))))).collect()
    }
    assert(e.getMessage.contains("array<float> or array<double>"))
    val strs = Seq(Tuple1(42)).toDF("t")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      strs.select(bridge.column(WordNgramsExpr(bridge.expression(col("t")), 2))).collect()
    }
    assert(e2.getMessage.contains("string"))
  }

  test("ArgMaxDot matches array_position(argmax) with first-max ties") {
    val sp = spark; import sp.implicits._
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val df = Seq(
      (Seq(2.0, 1.0), 0), // cell 0 beats duplicate cell 2 (first max)
      (Seq(1.0, 3.0), 1),
      (Seq(1.0, 1.0), 0)  // exact tie across all → first index
    ).toDF("u", "expected")
      .withColumn("cents", typedLit(cents))
    val rows = df.select(
      bridge.column(ArgMaxDot(
        bridge.expression(col("cents")), bridge.expression(col("u")))).as("k"),
      col("expected")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
