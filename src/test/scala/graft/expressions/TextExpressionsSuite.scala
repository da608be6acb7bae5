package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.TextFunctions

/** Native Catalyst expressions: codegen path, interpreted path, SQL
  * registration, and parity with the reference Scala kernels. */
class TextExpressionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val samples = Seq("Hello  World", "the quick brown fox",
    "a", "", "mixed CASE   And\tTabs")

  test("fingerprint expression matches the Scala kernel (codegen path)") {
    val sp = spark
    import sp.implicits._
    val out = samples.toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).collect().map(_.getLong(0))
    assert(out.toSeq == samples.map(TextFunctions.fingerprintF))
  }

  test("simhash expression matches the Scala kernel") {
    val sp = spark
    import sp.implicits._
    val out = samples.toDF("t")
      .select(TextFunctions.simhash64(col("t"))).collect().map(_.getLong(0))
    assert(out.toSeq == samples.map(TextFunctions.simhash64F))
  }

  test("registered SQL functions work in SqlSlots / expr()") {
    val sp = spark
    import sp.implicits._
    Seq(("x", "Hello  World")).toDF("id", "t").createOrReplaceTempView("tef")
    val row = spark.sql(
      "SELECT fnv_fingerprint(t) AS fp, simhash64(t) AS sh FROM tef")
      .collect().head
    assert(row.getLong(0) == TextFunctions.fingerprintF("Hello  World"))
    assert(row.getLong(1) == TextFunctions.simhash64F("Hello  World"))
  }

  test("expression stays inside whole-stage codegen (no UDF break)") {
    // spark.range forces a real codegen pipeline (local Seqs constant-fold)
    val df = spark.range(100)
      .select(concat(lit("doc "), col("id").cast("string")).as("t"))
      .select(TextFunctions.fingerprint(col("t")).as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    assert(df.distinct().count() == 100)
  }

  test("null input yields null, not a crash") {
    val sp = spark
    import sp.implicits._
    val out = Seq(Some("a"), None).toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }
}
