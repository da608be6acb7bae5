package graft.app

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import scala.concurrent.Await
import scala.concurrent.duration._
import graft.compute.SqlSlot
import graft.dimension.{DimSpec, DimType}

/** B1 dependency-tree propagation + E4 async execution + format surface
  * (orc/json managed outputs). */
class AppExecutionSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _
  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  override def beforeAll(): Unit = {
    work = Files.createTempDirectory("graft_exec_test").toString
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark
    import sp.implicits._
    Seq(("2026-08-12", 1.0), ("2026-08-12", 2.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/src/2026-08-12")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def buildChain(name: String, fmt: String = "parquet")
      : (Application, NodeRef, NodeRef) = {
    val app = new Application(name, spark, s"$work/app_$name")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val s1 = app.createData("s1", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")),
      attrs = graft.signal.DatasetAttrs(format = fmt))
    val s2 = app.createData("s2", Seq(s1), Seq(SqlSlot(
      "SELECT day, total * 10 AS scaled FROM s1")))
    app.activate()
    (app, s1, s2)
  }

  test("executeWithDependents re-runs downstream nodes (B1 full)") {
    val (app, s1, s2) = buildChain("deps")
    val completed = app.executeWithDependents(s1("2026-08-12"))
    assert(completed.length == 2)
    assert(app.poll(s2("2026-08-12")).isDefined)
    assert(app.load(s2("2026-08-12")).collect().head.getDouble(1) == 30.0)
  }

  test("executeAsync returns a pollable session future (E4)") {
    val (app, s1, _) = buildChain("async")
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = app.executeAsync(s1("2026-08-12"))
    val path = Await.result(fut, 120.seconds)
    assert(path.endsWith("2026-08-12"))
    assert(app.poll(s1("2026-08-12")).contains(path))
  }

  test("managed outputs round-trip through orc and json formats (S1/S6)") {
    Seq("orc", "json").foreach { fmt =>
      val (app, s1, s2) = buildChain(s"fmt_$fmt", fmt)
      app.executeWithDependents(s1("2026-08-12"))
      // s1 written as fmt; s2 read it back through InputLoader as fmt
      assert(app.load(s2("2026-08-12")).collect().head
        .getAs[Double]("scaled") == 30.0)
    }
  }

  test("event-driven process(): 2-input coincidence join at the app level") {
    val sp = spark
    import sp.implicits._
    Seq(("2026-08-12", 5.0)).toDF("day", "bonus")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/src_b/2026-08-12")
    val app = new Application("events", spark, s"$work/app_events")
    val a = app.marshalExternalData("a", s"$work/src", daySpec)
    val b = app.marshalExternalData("b", s"$work/src_b", daySpec)
    val joined = app.createData("joined", Seq(a.latest(1), b.latest(1)), Seq(SqlSlot(
      """SELECT a.day, CAST(SUM(a.amount + b.bonus) AS DOUBLE) AS total
         FROM a JOIN b ON a.day = b.day GROUP BY a.day""")))
    app.activate()
    // first event: node pending (b's tip not seen yet)
    assert(app.processPath(s"$work/src/2026-08-12").isEmpty)
    // aligned second event completes the coincidence and runs the slot
    val completed = app.processPath(s"$work/src_b/2026-08-12")
    assert(completed.nonEmpty)
    // (1+5) + (2+5) = 13
    assert(app.load(joined("2026-08-12")).collect().head.getDouble(1) == 13.0)
  }
}
