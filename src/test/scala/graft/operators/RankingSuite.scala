package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r16: distributed global ranking must match the single-partition
  * Window.orderBy answer bit-for-bit under a unique total order, while
  * never planning an empty-partition-spec Window (the all-rows-to-one-
  * partition shape it exists to replace). */
class RankingSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("ranking-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // 10007 rows (prime — not divisible by any tile count), scrambled
  // value order, a unique id tiebreaker
  private def fixture = spark.range(10007).select(
    col("id"),
    pmod(xxhash64(col("id")), lit(9991)).as("v"))

  test("row_number/ntile/percent_rank/cume_dist match the single-window " +
      "answer exactly under a unique total order") {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col("v").desc, col("id"))
    val w = Window.orderBy(order: _*)
    val expected = fixture.select(col("id"),
      row_number().over(w).cast("long").as("rn"),
      ntile(7).over(w).as("t7"),
      ntile(4).over(w).as("t4"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
    val (ranked, total) = Ranking.withGlobalRowNumber(fixture, order,
      partitions = 8)
    assert(total == 10007L)
    val got = ranked.select(col("id"), col("rn"),
      Ranking.ntileOf(col("rn"), total, 7).as("t7"),
      Ranking.ntileOf(col("rn"), total, 4).as("t4"),
      Ranking.percentRankOf(col("rn"), total).as("pr"),
      Ranking.cumeDistOf(col("rn"), total).as("cd"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "distributed global rank diverged from the single-window answer")
  }

  test("ntile edge: fewer rows than tiles -> tile == row number") {
    val (ranked, total) = Ranking.withGlobalRowNumber(
      spark.range(3).toDF("id"), Seq(col("id")), partitions = 4)
    assert(total == 3L)
    val rows = ranked.select(col("id"),
        Ranking.ntileOf(col("rn"), total, 7).as("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows == Map(0L -> 1, 1L -> 2, 2L -> 3))
  }

  test("single row: percent_rank 0.0, cume_dist 1.0") {
    val (ranked, total) = Ranking.withGlobalRowNumber(
      spark.range(1).toDF("id"), Seq(col("id")))
    val r = ranked.select(
      Ranking.percentRankOf(col("rn"), total).as("pr"),
      Ranking.cumeDistOf(col("rn"), total).as("cd")).collect().head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }

  test("rangeCountPreceding == native RANGE frame, incl. boundary ties") {
    // values on an integral grid with a width that PLANTS exact
    // collisions at both frame bounds: many rows share each value, and
    // v - width lands exactly on other rows' values — the inclusive/
    // exclusive bound semantics are exercised, not dodged
    val df = spark.range(5000).select(
      col("id"),
      (col("id") % 3).cast("string").as("g"),
      (pmod(xxhash64(col("id")), lit(200)) * 10).cast("double").as("v"))
    val native = df.selectExpr("id", "g", "v",
      """COUNT(*) OVER (PARTITION BY g ORDER BY v
         RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS c""")
    val got = Ranking.rangeCountPreceding(df, Seq("g"), "v", 500.0,
      keyCol = "id", outCol = "c")
      .select("id", "g", "v", "c")
    assert(got.exceptAll(native).isEmpty && native.exceptAll(got).isEmpty,
      "distributed range-frame count diverged from the native window")
  }

  test("rangeAggPreceding: weighted SUM over the range frame matches " +
      "the native window") {
    val df = spark.range(3000).select(
      col("id"),
      (col("id") % 2).cast("string").as("g"),
      (pmod(xxhash64(col("id")), lit(150)) * 10).cast("double").as("v"),
      pmod(xxhash64(col("id"), lit(3)), lit(97)).as("w"))
    val native = df.selectExpr("id", "g", "v", "w",
      """SUM(w) OVER (PARTITION BY g ORDER BY v
         RANGE BETWEEN 400.0 PRECEDING AND CURRENT ROW) AS s""")
    val got = Ranking.rangeAggPreceding(df, Seq("g"), "v", 400.0,
      keyCol = "id", weight = col("w"), outCol = "s")
      .select("id", "g", "v", "w", "s")
    assert(got.exceptAll(native).isEmpty && native.exceptAll(got).isEmpty,
      "distributed range-frame sum diverged from the native window")
  }

  test("rangeAggPreceding rejects null and fractional weights loudly " +
      "(r16 ADVICE: no silent truncation / no 0-for-NULL)") {
    val df = spark.range(10).select(col("id"),
      col("id").cast("double").as("v"))
    def run(w: org.apache.spark.sql.Column): Unit =
      Ranking.rangeAggPreceding(df, Nil, "v", 3.0, keyCol = "id",
        weight = w).collect()
    val eNull = intercept[Exception] {
      run(when(col("id") === 5, lit(null)).otherwise(lit(1L)))
    }
    assert(eNull.getMessage.contains("non-null"), eNull.getMessage)
    val eFrac = intercept[Exception] { run(lit(2.5)) }
    assert(eFrac.getMessage.contains("fractional"), eFrac.getMessage)
    // integral weights of any numeric type still pass
    assert(run(lit(2).cast("int")) == (()))
  }

  test("rangeCountPreceding with no partition columns") {
    val df = spark.range(1000).select(col("id"),
      pmod(xxhash64(col("id")), lit(100)).cast("double").as("v"))
    val native = df.selectExpr("id", "v",
      """COUNT(*) OVER (ORDER BY v
         RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW) AS c""")
    val got = Ranking.rangeCountPreceding(df, Seq.empty, "v", 10.0,
      keyCol = "id", outCol = "c").select("id", "v", "c")
    assert(got.exceptAll(native).isEmpty && native.exceptAll(got).isEmpty)
  }

  test("plan never contains an empty-partition-spec Window") {
    val (ranked, _) = Ranking.withGlobalRowNumber(fixture,
      Seq(col("v"), col("id")), partitions = 8)
    val plan = ranked.queryExecution.executedPlan.toString
    // the local window partitions by __pid; a global-order Window would
    // print "Window [...], [v ... ASC" with no partition spec between
    // the function list and the ordering
    assert(!plan.contains("Window ["), // windows resolve pre-checkpoint
      s"unexpected Window in the post-checkpoint plan:\n$plan")
  }
}
