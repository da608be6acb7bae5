package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.app._
import graft.compute._
import graft.dimension._

/** Flagship end-to-end pipeline (SURVEY.md §7.2): stages the sf data as a
  * day-partitioned external dataset, then runs a two-node DAG through the
  * orchestrator — ranged input union (S3), SQL slot with {dim}
  * parametrization (S9/S10), managed write with _SUCCESS + schema (S6),
  * feed-back trigger of the downstream node (B2), and a read-back.
  */
object Pipeline {

  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  /** Stage `orders` as root/<yyyy-MM-dd>/ parquet partitions (idempotent per
    * (sfDir, nDays); Spark's committer writes the _SUCCESS markers). */
  def stageOrdersByDay(spark: SparkSession, sfDir: String, scratch: String,
                       nDays: Int): Seq[String] = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("day", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    val days = orders.select(max("day")).collect().head.getString(0) match {
      case maxDay =>
        orders.select(col("day")).where(col("day") <= maxDay).distinct()
          .orderBy(col("day").desc).limit(nDays)
          .collect().map(_.getString(0)).toSeq.sorted
    }
    val fs = new org.apache.hadoop.fs.Path(scratch)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    days.foreach { d =>
      val dir = new org.apache.hadoop.fs.Path(s"$scratch/$d")
      if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
        orders.where(col("day") === d).drop("day")
          .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    }
    days
  }

  /** Build + activate the app; returns (app, source node, final node, days). */
  def build(spark: SparkSession, sfDir: String, workDir: String,
            rangeDays: Int = 2): (Application, NodeRef, NodeRef, Seq[String]) = {
    val scratch = s"$workDir/source/orders_daily"
    val days = stageOrdersByDay(spark, sfDir, scratch, rangeDays + 1)
    val app = new Application("graft-flagship", spark, s"$workDir/app")

    val ordersDaily = app.marshalExternalData("orders_daily", scratch, daySpec)

    // stage 1: union of the last `rangeDays` daily partitions, SQL slot with
    // {day} parametrization; completion-checked range
    val dailyRevenue = app.createData(
      id = "daily_revenue",
      inputs = Seq(ordersDaily.latest(rangeDays).rangeCheck()),
      computeTargets = Seq(SqlSlot(
        """SELECT '{day}' AS day, o_orderstatus,
                  COUNT(*) AS order_cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders_daily GROUP BY o_orderstatus""")))

    // stage 2: consumes stage 1's managed output via feed-back
    val statusSummary = app.createData(
      id = "status_summary",
      inputs = Seq(dailyRevenue),
      computeTargets = Seq(ScalaSlot { ctx =>
        ctx.input("daily_revenue")
          .withColumn("avg_order", (col("total") / col("order_cnt")).cast("double"))
          .orderBy(col("o_orderstatus"))
      }))

    app.activate()
    (app, ordersDaily, statusSummary, days)
  }

  /** Event-driven end-to-end run; returns the final node's DataFrame. */
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    // fingerprint-keyed like the fw staging: regenerated source data
    // must never reuse stale staged partitions (VERDICT r16 Next #1)
    val workDir = s"/tmp/graft_entry_${new java.io.File(sfDir).getName}" +
      s"_${graft.queries.Framework.sourceFingerprint(sfDir)}"
    val (app, _, statusSummary, days) = build(spark, sfDir, workDir)
    val tip = days.last
    // the tip partition's completion event arrives → range {tip, tip-1}
    // complete → stage 1 runs → feed-back → stage 2 runs
    val completed = app.processPath(s"$workDir/source/orders_daily/$tip")
    require(completed.nonEmpty, s"pipeline did not trigger for day=$tip")
    app.load(statusSummary(tip))
  }
}
