import org.apache.spark.sql.SparkSession
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(20, false)
    println("ENTRY_ROWS=" + df.count())
    spark.stop()
  }
}
