package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for optimization rounds: writes
  * `.explain("formatted")` for each named query — plus the SETTLED
  * adaptive plan after one execution (AQE join rewrites /
  * AQEShuffleRead coalescing only appear post-run) — to
  * `<outDir>/<name>_<suffix>.txt`.
  *
  * Usage: graft.PlanDump <outDir> <suffix> [names,csv] [sfDir]
  * Session config mirrors Bench (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus) so the dumped plans are the benched plans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only = if (args.length > 2 && args(2).nonEmpty)
      args(2).split(",").map(_.trim).toSeq else Nil
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_SCAN_MIN_PARTITIONS", cpus))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries
    val names = if (only.nonEmpty) only else qs.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = qs(name)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // settle AQE on THIS df's queryExecution (a noop write would
        // execute a separate plan copy) — WITHOUT collecting the result
        // to the driver (ADVICE r20 #3: collect() OOMs on large-result
        // queries at big SFs); iterating the executed RDD computes every
        // partition and discards rows executor-side
        df.queryExecution.toRdd.foreach(_ => ())
        val settled = df.queryExecution.executedPlan.toString
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          (s"== $name @ $sfDir (shuffle.partitions=" +
            spark.sessionState.conf.numShufflePartitions + ")\n\n" +
            formatted +
            "\n\n== settled adaptive plan (after execution) ==\n\n" +
            settled + "\n").getBytes("UTF-8"))
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
