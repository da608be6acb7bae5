package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Scale-guard over the whole query surface: no relational or pipeline
  * query may plan an all-pairs join (BroadcastNestedLoopJoin /
  * CartesianProduct) — those are O(n²) scale-killers that stay invisible
  * at test scale factors. Every pair-producing operator must go through a
  * bucketed / banded candidate path instead.
  */
class PlanCheckSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("no p-/q-query plans an all-pairs join") {
    val queries = (graft.queries.Relational.queries ++
      graft.queries.Relational2.queries ++
      graft.queries.PipelineOps.queries)
    val offenders = queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan = q(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"all-pairs join planned in: ${offenders.mkString(", ")}")
  }
}
