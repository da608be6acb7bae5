package graft.compute

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r16 (VERDICT r15 #8): the compaction/claim machinery is observable
  * — swaps, collapsed files, heals, and claim contention land in the
  * SAME alarmable platform-metric series routing health uses, so a
  * nightly loop that heals (crashes) every run or spins on contention
  * raises an alarm instead of only leaving WARN lines in a log. */
class MaintenanceMetricsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("maintenance-metrics-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    work = java.nio.file.Files.createTempDirectory("graft_mm").toString
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def staged(): String = {
    val sp = spark; import sp.implicits._
    val docs = (0L until 30L).map(i =>
      (i, s"some document body number $i with shared words")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mm_idx").toString
    graft.operators.Dedup.saveNearDupIndex(
      graft.operators.Dedup.buildNearDupIndex(docs, "text", "doc_id",
        k = 8, bands = 4, shingleN = 2), dir)
    (0 until 4).foreach { b =>
      graft.operators.Dedup.updateNearDupIndex(spark, dir,
        Seq((100L + b, s"fresh doc $b")).toDF("doc_id", "text"), "text")
    }
    dir
  }

  test("compaction, heal, and claim events land in platformMetricsDf " +
      "and alarm like any metric") {
    MaintenanceMetrics.reset()
    val dir = staged()

    // 1. a real swap: swaps/filesCollapsed/bytes/wall all move
    val stats = graft.operators.Dedup.compactNearDupIndex(spark, dir)
    assert(!stats.sigs.skipped)
    val s1 = MaintenanceMetrics.snapshot
    assert(s1("maintenance.compaction.swaps") >= 2.0, s1) // sigs + grams
    assert(s1("maintenance.compaction.filesCollapsed") >= 4.0, s1)
    assert(s1("maintenance.compaction.bytesRewritten") > 0.0, s1)
    assert(s1.contains("maintenance.compaction.wallMs"), s1)

    // 2. an immediate re-compact is a skip
    graft.operators.Dedup.compactNearDupIndex(spark, dir)
    assert(MaintenanceMetrics.snapshot("maintenance.compaction.skipped") >= 2.0)

    // 3. claim contention: a fresh foreign claim refuses the update
    val claim = new java.io.File(s"$dir/.neardup-compact-claim")
    val w = new java.io.FileWriter(claim)
    try w.write(s"other\t${System.currentTimeMillis()}") finally w.close()
    val sp = spark; import sp.implicits._
    intercept[IllegalStateException] {
      graft.operators.Dedup.updateNearDupIndex(spark, dir,
        Seq((900L, "blocked")).toDF("doc_id", "text"), "text")
    }
    assert(MaintenanceMetrics.snapshot("maintenance.claim.contention") >= 1.0)

    // 4. a stale claim clears (and counts) on the next entrant
    val w2 = new java.io.FileWriter(claim)
    try w2.write(s"dead\t${System.currentTimeMillis() - 100000}") finally w2.close()
    graft.operators.Dedup.compactNearDupIndex(spark, dir, claimTtlMs = 10L)
    assert(MaintenanceMetrics.snapshot("maintenance.claim.staleCleared") >= 1.0)

    // 5. a crashed swap heals (rollback) — and counts
    graft.operators.Dedup.updateNearDupIndex(spark, dir,
      Seq((901L, "one more doc")).toDF("doc_id", "text"), "text")
    intercept[RuntimeException] {
      graft.operators.Dedup.compactNearDupIndex(spark, dir,
        failpoint = l => if (l == "old-moved") sys.error("boom"))
    }
    assert(graft.operators.Dedup.healNearDupIndex(spark, dir))
    assert(MaintenanceMetrics.snapshot("maintenance.heal.rolledBack") >= 1.0)

    // 6. the same numbers surface through ANY Application's platform
    // series and feed the alarm machinery (the probeFailures pattern)
    val app = new graft.app.Application("mm", spark, s"$work/app_mm")
    app.activate()
    val pm = app.platformMetricsDf()
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(pm("maintenance.compaction.swaps") >= 2.0, pm)
    assert(pm("maintenance.claim.staleCleared") >= 1.0, pm)
    val alarm = app.createMetricAlarm("compactor_crashing",
      () => app.platformMetricsDf()
        .where(col("name") === "maintenance.claim.staleCleared"),
      graft.diagnostics.AlarmParams(1.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold, 1, 1),
      periodSecs = 60)
    assert(alarm.signal.alias == "compactor_crashing")
    val transitions = app.alarmMonitor().poll()
    assert(transitions.exists(t => t.alarmId == "compactor_crashing" &&
      t.state == graft.diagnostics.Alarms.ALARM),
      s"stale-clear (a crashed compactor) must be alarmable: $transitions")
  }
}
