import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans of headline queries and grep-able
  * markers (PushedFilters, join strategies, WholeStageCodegen spans). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toList
      else List("q01_agg_pricing", "q02_join_agg_topk", "q03_star_join",
        "q05_semi_join", "p01_exact_dedup", "p05_cosine_topk")
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
