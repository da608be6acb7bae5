package graft.app

import org.apache.spark.sql.SparkSession

/** Forked-JVM driver for the cross-process multi-driver proof: attaches
  * the dev context persisted by the primary driver's saveDevState, joins
  * the sharded deployment pinned to one shard (its own SparkSession —
  * nothing shared with the primary but the filesystem), signals
  * readiness, and runs shardedCycle on a poll cadence until the deadline.
  * Executions it picks up run REAL SqlSlots in THIS process.
  *
  * args: appName rootDir shard driverId durationMillis
  */
object ShardedDriverMain {
  def main(args: Array[String]): Unit = {
    val Array(appName, root, shard, driverId, durMs) = args
    val spark = SparkSession.builder().master("local[2]")
      .appName(s"graft-sharded-driver-$driverId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val app = Application.attach(appName, spark, root)
      app.activateSharded(driverId, 2, shards = Some(Set(shard.toInt)))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, s"driver-ready-$driverId"),
        Array.emptyByteArray)
      val deadline = System.currentTimeMillis() + durMs.toLong
      while (System.currentTimeMillis() < deadline) {
        app.shardedCycle()
        Thread.sleep(200)
      }
      app.terminate()
    } finally spark.stop()
  }
}
