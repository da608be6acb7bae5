import org.apache.spark.sql.SparkSession
import graft.operators.{Dedup, MinHashAggregator}

/** Dev tool: column-based vs aggregator-based MinHash signatures. */
object MinHashBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("warmup")(docs.count())
    time("columns(k=64)")(Dedup.minhashSignatures(docs, "text", "doc_id", 64, 3).count())
    time("aggregator(k=64)")(MinHashAggregator.signatures(docs, "text", "doc_id", 64, 3).count())
    time("columns#2")(Dedup.minhashSignatures(docs, "text", "doc_id", 64, 3).count())
    time("aggregator#2")(MinHashAggregator.signatures(docs, "text", "doc_id", 64, 3).count())
    spark.stop()
  }
}
