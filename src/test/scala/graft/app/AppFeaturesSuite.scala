package graft.app

import java.nio.file.Files
import scala.concurrent.Await
import scala.concurrent.duration._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.compute._
import graft.dimension._
import graft.signal.{DatasetAttrs, DatasetType}

/** A local FS whose status calls THROW for paths containing "poison" —
  * the store-fault stand-in for the r15 per-route probe-failure-counter
  * test (registered at the `faulty:` scheme inside the test). */
object FaultyStatusFs {
  /** Armed AFTER event ingestion so only the SWEEP's probes fault —
    * the per-route counter under test is the sweep-side attribution. */
  @volatile var armed = false
}
class FaultyStatusFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")
  private def boom(p: org.apache.hadoop.fs.Path): Unit =
    if (FaultyStatusFs.armed && p.toString.contains("poison"))
      throw new java.io.IOException(s"simulated store failure probing $p")
  // RawLocalFileSystem overrides exists() directly (it does NOT route
  // through getFileStatus) — poison both probe entry points
  override def exists(p: org.apache.hadoop.fs.Path): Boolean = {
    boom(p); super.exists(p)
  }
  override def getFileStatus(p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = {
    boom(p); super.getFileStatus(p)
  }
}

/** End-to-end Application features: catalog inputs with partition pruning
  * (S2), slot retry (E3), retention sweeps (R1), APPEND datasets, CSV
  * format attributes, multi-statement SQL slots (S9). */
class AppFeaturesSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _
  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  override def beforeAll(): Unit = {
    work = Files.createTempDirectory("graft_app_test").toString
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def stageDays(root: String, days: Seq[String]): Unit = {
    val sp = spark
    import sp.implicits._
    days.foreach { d =>
      Seq((d, 1.0), (d, 2.0), (d, 3.0)).toDF("day", "amount")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/$d")
    }
  }

  test("catalog input (S2): isin partition pruning through spark.table") {
    val sp = spark
    import sp.implicits._
    Seq(("2026-08-10", 10L), ("2026-08-11", 20L), ("2026-08-12", 30L),
      ("2026-08-12", 40L))
      .toDF("day", "v").write.mode("overwrite")
      .partitionBy("day").saveAsTable("sales")

    val app = new Application("cat", spark, s"$work/app_cat")
    val sales = app.marshalCatalogTable("sales", "default", "sales", daySpec)
    val node = app.createData("daily_sales", Seq(sales.latest(2)), Seq(SqlSlot(
      "SELECT CAST(SUM(v) AS BIGINT) AS total, COUNT(*) AS cnt FROM sales")))
    app.activate()
    app.execute(node("2026-08-12"))
    val out = app.load(node("2026-08-12")).collect().head
    // last 2 days = 11th (20) + 12th (30+40) = 90, 3 rows — the 10th pruned
    assert(out.getLong(0) == 90L && out.getLong(1) == 3L)
  }

  test("slot retry (E3): transient failures retried with backoff") {
    stageDays(s"$work/src_retry", Seq("2026-08-12"))
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    var sleeps = List.empty[Long]
    val app = new Application("retry", spark, s"$work/app_retry")
    val src = app.marshalExternalData("src", s"$work/src_retry", daySpec)
    val node = app.createData("flaky", Seq(src.latest(1)), Seq(ScalaSlot { ctx =>
      if (attempts.incrementAndGet() < 3) sys.error("transient")
      ctx.input("src").groupBy("day").agg(count(lit(1)).as("cnt"))
    }), retry = RetryPolicy(maxRetries = 3, backoffMs = 10,
      sleeper = ms => sleeps :+= ms))
    app.activate()
    app.execute(node("2026-08-12"))
    assert(attempts.get() == 3)
    assert(sleeps == List(10L, 20L)) // exponential backoff
    assert(app.load(node("2026-08-12")).collect().head.getLong(1) == 3L)
  }

  test("retry exhaustion propagates the failure") {
    stageDays(s"$work/src_fail", Seq("2026-08-12"))
    val app = new Application("fail", spark, s"$work/app_fail")
    val src = app.marshalExternalData("src", s"$work/src_fail", daySpec)
    val node = app.createData("dead", Seq(src.latest(1)), Seq(ScalaSlot { _ =>
      sys.error("permanent")
    }), retry = RetryPolicy(maxRetries = 2, backoffMs = 1, sleeper = _ => ()))
    app.activate()
    val e = intercept[RuntimeException](app.execute(node("2026-08-12")))
    assert(e.getMessage.contains("permanent"))
  }

  test("retention (R1): keep newest partitions, evict the rest") {
    stageDays(s"$work/src_ret", Seq("2026-08-10", "2026-08-11", "2026-08-12"))
    val app = new Application("ret", spark, s"$work/app_ret")
    val src = app.marshalExternalData("src", s"$work/src_ret", daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS total FROM src")))
    app.activate()
    Seq("2026-08-10", "2026-08-11", "2026-08-12").foreach(d => app.execute(node(d)))
    assert(app.poll(node("2026-08-10")).isDefined)
    val evicted = app.applyRetention(node, keepLatest = 2)
    assert(evicted.length == 1 && evicted.head.endsWith("2026-08-10"))
    assert(app.poll(node("2026-08-10")).isEmpty)
    assert(app.poll(node("2026-08-11")).isDefined)
    assert(app.poll(node("2026-08-12")).isDefined)
  }

  test("retention (R1): unpadded LONG partitions evict numerically, not lexically") {
    val sp = spark
    import sp.implicits._
    val longSpec = DimSpec.pretty("p" -> (DimType.LONG, Map[String, Any]()))
    Seq(9L, 10L, 11L).foreach { p =>
      Seq((p, 1.0)).toDF("p", "amount")
        .coalesce(1).write.mode("overwrite").parquet(s"$work/src_lret/$p")
    }
    val app = new Application("lret", spark, s"$work/app_lret")
    val src = app.marshalExternalData("src", s"$work/src_lret", longSpec)
    val node = app.createData("lret_out", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS total FROM src")))
    app.activate()
    Seq(9L, 10L, 11L).foreach(p => app.execute(node(p)))
    // lexicographic descending would keep "9" and evict "10" — typed order
    // must keep 10 and 11 and evict 9
    val evicted = app.applyRetention(node, keepLatest = 2)
    assert(evicted.length == 1 && evicted.head.endsWith("/9"), evicted.mkString(","))
    assert(app.poll(node(9L)).isEmpty)
    assert(app.poll(node(10L)).isDefined)
    assert(app.poll(node(11L)).isDefined)
  }

  test("APPEND dataset type accumulates across executions") {
    stageDays(s"$work/src_app", Seq("2026-08-12"))
    val app = new Application("app", spark, s"$work/app_append")
    val src = app.marshalExternalData("src", s"$work/src_app", daySpec)
    val node = app.createData("acc", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, amount FROM src")),
      attrs = DatasetAttrs(datasetType = DatasetType.APPEND))
    app.activate()
    app.execute(node("2026-08-12"))
    app.execute(node("2026-08-12"))
    assert(app.load(node("2026-08-12")).count() == 6L) // 3 rows x 2 runs
  }

  test("app-level compaction reserves the partition against executions (r15)") {
    val sp = spark; import sp.implicits._
    stageDays(s"$work/src_cmp", Seq("2026-08-12"))
    val app = new Application("cmpapp", spark, s"$work/app_cmpapp")
    val src = app.marshalExternalData("src", s"$work/src_cmp", daySpec)
    val node = app.createData("acc", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, amount FROM src")),
      attrs = DatasetAttrs(datasetType = DatasetType.APPEND))
    app.activate()
    // accumulate wide appends, then compact through the app surface —
    // the rename-free KV variant, with the partition reserved
    (1 to 3).foreach(_ => app.execute(node("2026-08-12")))
    val dir = s"$work/app_cmpapp/internal_data/acc/2026-08-12"
    val stats = app.compactPartition(node("2026-08-12"), 64L << 20,
      kv = Some(new graft.routing.InMemoryConditionalKv))
    assert(!stats.skipped && stats.filesAfter < stats.filesBefore)
    assert(spark.read.parquet(dir).count() == 9L) // 3 rows x 3 runs
    // a busy partition refuses compaction loudly instead of racing
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val latch = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val slow = app.createData("slowacc", Seq(src.latest(1).as("srcs")),
      Seq(graft.compute.ScalaSlot { ctx =>
        latch.countDown(); release.await(); ctx.input("srcs")
      }), attrs = DatasetAttrs(datasetType = DatasetType.APPEND))
    app.activate()
    val fut = app.executeAsync(slow("2026-08-12"))
    latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
    val e = intercept[IllegalStateException] {
      app.compactPartition(slow("2026-08-12"), 64L << 20)
    }
    assert(e.getMessage.contains("active on"), e.getMessage)
    release.countDown()
    scala.concurrent.Await.result(fut, 120.seconds)
    // once the execution drains, compaction proceeds (or no-ops)
    app.compactPartition(slow("2026-08-12"), 64L << 20)
    ()
  }

  test("multi-statement SQL slot (S9): intermediate views, last result wins") {
    stageDays(s"$work/src_ms", Seq("2026-08-12"))
    val app = new Application("ms", spark, s"$work/app_ms")
    val src = app.marshalExternalData("src", s"$work/src_ms", daySpec)
    val node = app.createData("multi", Seq(src.latest(1)), Seq(SqlSlot(
      """CREATE OR REPLACE TEMP VIEW doubled AS SELECT day, amount * 2 AS amount FROM src;
         SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM doubled GROUP BY day""")))
    app.activate()
    app.execute(node("2026-08-12"))
    assert(app.load(node("2026-08-12")).collect().head.getDouble(1) == 12.0)
  }

  test("app-level recover: a restarted driver resumes pending joins") {
    stageDays(s"$work/src_rc_a", Seq("2026-08-12"))
    stageDays(s"$work/src_rc_b", Seq("2026-08-12"))
    val root = s"$work/app_recover"
    def mkApp(): (Application, NodeRef) = {
      val app = new Application("recover", spark, root)
      val a = app.marshalExternalData("a", s"$work/src_rc_a", daySpec)
      val b = app.marshalExternalData("b", s"$work/src_rc_b", daySpec)
      val j = app.createData("joined", Seq(a.latest(1), b.latest(1)), Seq(SqlSlot(
        """SELECT a.day, CAST(SUM(a.amount + b.amount) AS DOUBLE) AS total
           FROM a JOIN b ON a.day = b.day GROUP BY a.day""")))
      app.activate()
      (app, j)
    }
    val (app1, _) = mkApp()
    assert(app1.processPath(s"$work/src_rc_a/2026-08-12").isEmpty) // half-join
    // driver restarts: fresh Application over the same root
    val (app2, j2) = mkApp()
    assert(app2.recover().isEmpty) // pending rebuilt, nothing mid-flight
    assert(app2.pendingNodeCounts == Map("joined" -> 1))
    val done = app2.processPath(s"$work/src_rc_b/2026-08-12")
    assert(done.nonEmpty)
    // 3 rows per side join on day: sum(a+b) over 9 pairs = 3*6 + 3*6
    assert(app2.load(j2("2026-08-12")).collect().head.getDouble(1) == 36.0)
    // a third restart replays a COMPACTED log and re-runs nothing
    val (app3, _) = mkApp()
    assert(app3.recover().isEmpty)
    val segments = new java.io.File(s"$root/routing_state.json.d")
      .listFiles().map(_.getName).filter(_.startsWith("wal-"))
    assert(segments.length <= 2, segments.mkString(",")) // compacted + open tail
  }

  test("lifecycle: pause drops events, resume processes, terminate clears runtime") {
    stageDays(s"$work/src_life", Seq("2026-08-12"))
    val app = new Application("life", spark, s"$work/app_life")
    val src = app.marshalExternalData("src", s"$work/src_life", daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()
    assert(app.state == app.AppState.ACTIVE)
    app.pause()
    // a paused app ignores events (the reference pauses the processor)...
    assert(app.processPath(s"$work/src_life/2026-08-12").isEmpty)
    assert(app.poll(node("2026-08-12")).isEmpty)
    // ...but manual execute still works in PAUSED (application.py:1919-1926)
    app.execute(node("2026-08-12"))
    assert(app.poll(node("2026-08-12")).isDefined)
    app.resume()
    assert(app.processPath(s"$work/src_life/2026-08-12").nonEmpty)
    app.terminate()
    assertThrows[IllegalStateException](
      app.processPath(s"$work/src_life/2026-08-12"))
    app.activate() // dev context survives termination
    assert(app.processPath(s"$work/src_life/2026-08-12").nonEmpty)
  }

  test("introspection + updateData: list/search nodes, replace a definition") {
    stageDays(s"$work/src_intro", Seq("2026-08-12"))
    val app = new Application("intro", spark, s"$work/app_intro")
    val src = app.marshalExternalData("src", s"$work/src_intro", daySpec)
    app.createData("daily_sum", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS v FROM src")))
    app.createData("daily_max", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT CAST(MAX(amount) AS DOUBLE) AS v FROM src")))
    assert(app.listData == List("daily_sum", "daily_max"))
    assert(app.searchData("max").map(_.signal.alias) == List("daily_max"))
    assert(app.getData("nope").isEmpty)
    // redefine daily_sum to a count before activation
    val updated = app.updateData("daily_sum", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM src")))
    app.activate()
    app.execute(updated("2026-08-12"))
    assert(app.load(updated("2026-08-12")).collect().head.getDouble(0) == 3.0)
    // pending-node introspection: a half-satisfied join shows up
    val app2 = new Application("intro2", spark, s"$work/app_intro2")
    val a = app2.marshalExternalData("a", s"$work/src_intro", daySpec)
    val b = app2.marshalExternalData("b", s"$work/src_intro_b", daySpec)
    app2.createData("j", Seq(a.latest(1), b.latest(1)), Seq(SqlSlot(
      "SELECT 1 AS one FROM a")))
    app2.activate()
    app2.processPath(s"$work/src_intro/2026-08-12")
    assert(app2.pendingNodeCounts == Map("j" -> 1))
  }

  test("alarm state transitions trigger data nodes like any signal") {
    stageDays(s"$work/src_alarm", Seq("2026-08-12"))
    val app = new Application("alarm", spark, s"$work/app_alarm")
    val alarm = app.marshalAlarm("err_alarm")
    val src = app.marshalExternalData("src", s"$work/src_alarm", daySpec)
    // react ONLY to transitions into ALARM; data rides as a reference input
    val node = app.createData("on_alarm", Seq(alarm("ALARM", "*"), src.latest(1).ref),
      Seq(SqlSlot(
        """SELECT '{state_transition}' AS state,
                  CAST(SUM(amount) AS DOUBLE) AS total FROM src""")),
      outputLinks = List(graft.signal.DimensionLink.literal(
        graft.signal.DimRef("src", "day"), "2026-08-12")))
    app.activate()
    // OK transition: declared filter rejects it, nothing runs
    assert(app.raiseAlarm(alarm, "OK", "2026-08-12 03").isEmpty)
    // ALARM transition triggers the node
    val completed = app.raiseAlarm(alarm, "ALARM", "2026-08-12 03")
    assert(completed.nonEmpty)
    assert(app.load(node("ALARM", "2026-08-12 03")).collect().head.getDouble(1) == 6.0)
  }

  test("upstream-app import: cross-app dependency with completion protocol") {
    stageDays(s"$work/src_up", Seq("2026-08-12"))
    // producer app materializes a partition in its own root
    val producer = new Application("producer", spark, s"$work/app_producer")
    val pSrc = producer.marshalExternalData("src", s"$work/src_up", daySpec)
    val pNode = producer.createData("daily_totals", Seq(pSrc.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    producer.activate()
    producer.execute(pNode("2026-08-12"))
    // consumer app imports the producer's managed output read-only
    val consumer = new Application("consumer", spark, s"$work/app_consumer")
    val imported = consumer.importUpstream(
      "daily_totals", s"$work/app_producer", "daily_totals", daySpec)
    val cNode = consumer.createData("scaled", Seq(imported.latest(1)), Seq(SqlSlot(
      "SELECT day, total * 2 AS doubled FROM daily_totals")))
    consumer.activate()
    consumer.execute(cNode("2026-08-12"))
    assert(consumer.load(cNode("2026-08-12")).collect().head.getDouble(1) == 12.0)
  }

  test("scheduler: multi-timer catch-up fires chronologically; poller runs") {
    val app = new Application("sched", spark, s"$work/app_sched")
    val hourly = app.createTimer("hourly", format = "%Y-%m-%d %H",
      dimName = "hour", scheduleExpression = "rate(1 hour)")
    val daily = app.createTimer("daily", dimName = "day",
      scheduleExpression = "cron(30 0 * * ? *)")
    assert(hourly.signal.alias == "hourly" && daily.signal.alias == "daily")
    app.activate()
    val utc = java.time.ZoneOffset.UTC
    val t0 = java.time.LocalDateTime.of(2026, 8, 11, 23, 30).toInstant(utc)
    val sched = app.scheduler(startAt = t0)
    // a driver asleep for 2.5 hours owes every missed tick, in time order
    // across BOTH timers: 00:00 hourly, 00:30 daily cron, 01:00, 02:00
    val fired = sched.advanceTo(
      java.time.LocalDateTime.of(2026, 8, 12, 2, 0).toInstant(utc))
    assert(fired.map(_._1) == List("hourly", "daily", "hourly", "hourly"))
    assert(fired.map(_._2.toString) == List(
      "2026-08-12T00:00:00Z", "2026-08-12T00:30:00Z",
      "2026-08-12T01:00:00Z", "2026-08-12T02:00:00Z"))
    // nothing more due at the same instant (strictly-after semantics)
    assert(sched.advanceTo(
      java.time.LocalDateTime.of(2026, 8, 12, 2, 0).toInstant(utc)).isEmpty)
    assert(sched.nextFireTimes("hourly").toString == "2026-08-12T03:00:00Z")
    // wall-clock poller starts and stops cleanly (fires nothing: next
    // fire times are in 2026 relative to the manual clock already)
    sched.start(pollMillis = 50); Thread.sleep(120); sched.stop()
    // duplicate schedule id rejected
    intercept[IllegalArgumentException](
      app.createTimer("hourly", scheduleExpression = "rate(1 day)"))
  }

  test("alarm monitor raises transitions only, scans forward, triggers nodes") {
    val sp = spark
    import sp.implicits._
    stageDays(s"$work/src_mon", Seq("2026-08-12"))
    val app = new Application("mon", spark, s"$work/app_mon")
    // a growing in-memory metric series the monitor re-reads per poll
    var rows = Seq(("m", "2026-08-10 00:00:00", 10.0), ("m", "2026-08-11 00:00:00", 9.0))
    val alarm = app.createMetricAlarm("hot",
      () => rows.toDF("name", "period_start", "value")
        .withColumn("period_start", to_timestamp(col("period_start"))),
      graft.diagnostics.AlarmParams(5.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1),
      periodSecs = 86400, timeFormat = "%Y-%m-%d")
    val src = app.marshalExternalData("src", s"$work/src_mon", daySpec)
    val node = app.createData("on_hot", Seq(alarm("ALARM", "*"), src.latest(1).ref),
      Seq(SqlSlot("SELECT '{time}' AS day, CAST(SUM(amount) AS DOUBLE) AS total FROM src")),
      outputLinks = List(graft.signal.DimensionLink.literal(
        graft.signal.DimRef("src", "day"), "2026-08-12")))
    app.activate()
    val mon = app.alarmMonitor()

    // two breaching periods -> ONE transition (into ALARM), node ran
    val t1 = mon.poll()
    assert(t1.map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("ALARM", "2026-08-10")))
    assert(t1.head.completions.nonEmpty, "ALARM edge must trigger the node")
    assert(app.load(node("ALARM", "2026-08-10")).collect().head.getDouble(1) == 6.0)

    // steady state: nothing new -> no re-fire
    assert(mon.poll().isEmpty)

    // series recovers -> exactly one OK transition (filtered by the node's
    // declared ALARM-only filter, so no new execution)
    rows :+= (("m", "2026-08-12 00:00:00", 1.0))
    val t2 = mon.poll()
    assert(t2.map(_.state) == List("OK") && t2.head.completions.isEmpty)
    assert(mon.poll().isEmpty)

    // LATE INTRA-PERIOD DATA flips the already-consumed newest period:
    // the corrected edge must raise (the open period's first read was
    // partial — a change-only protocol must not keep the stale state)
    rows :+= (("m", "2026-08-12 12:00:00", 99.0)) // same day-period, now breaching
    val t3 = mon.poll()
    assert(t3.map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("ALARM", "2026-08-12")),
      s"late-data state flip of the open period was dropped: $t3")
    assert(mon.poll().isEmpty)
  }

  test("alarm monitor isolates a failing series from healthy alarms") {
    val sp = spark
    import sp.implicits._
    val app = new Application("mon_iso", spark, s"$work/app_mon_iso")
    var broken = true
    app.createMetricAlarm("bad",
      () => if (broken) sys.error("store deleted")
        else Seq(("b", "2026-08-10 00:00:00", 10.0))
          .toDF("name", "period_start", "value")
          .withColumn("period_start", to_timestamp(col("period_start"))),
      graft.diagnostics.AlarmParams(5.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1),
      periodSecs = 86400, timeFormat = "%Y-%m-%d")
    app.createMetricAlarm("good",
      () => Seq(("g", "2026-08-10 00:00:00", 10.0))
        .toDF("name", "period_start", "value")
        .withColumn("period_start", to_timestamp(col("period_start"))),
      graft.diagnostics.AlarmParams(5.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1),
      periodSecs = 86400, timeFormat = "%Y-%m-%d")
    app.activate()
    val mon = app.alarmMonitor()
    // the broken series must not starve the healthy alarm
    val t1 = mon.poll()
    assert(t1.map(_.alarmId) == List("good"),
      s"healthy alarm starved by a failing sibling: $t1")
    // once the store heals, the broken alarm catches up
    broken = false
    val t2 = mon.poll()
    assert(t2.map(_.alarmId) == List("bad"), s"healed alarm never raised: $t2")
    // misconfigured params fail at construction, CloudWatch-style
    intercept[IllegalArgumentException](graft.diagnostics.AlarmParams(
      5.0, graft.diagnostics.AlarmComparison.GreaterThanThreshold,
      evaluationPeriods = 3, datapointsToAlarm = 0))
    intercept[IllegalArgumentException](graft.diagnostics.AlarmParams(
      5.0, graft.diagnostics.AlarmComparison.GreaterThanThreshold,
      evaluationPeriods = 0, datapointsToAlarm = 1))
  }

  test("dev state round-trips: serialize, attach in a new session, execute") {
    stageDays(s"$work/src_devstate", Seq("2026-08-11", "2026-08-12"))
    val root = s"$work/app_devstate"
    val app1 = new Application("devstate", spark, root)
    val src = app1.marshalExternalData("src", s"$work/src_devstate", daySpec)
    app1.createTimer("midnight", dimName = "day",
      scheduleExpression = "cron(0 0 * * ? *)")
    val curated = app1.createData("curated", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app1.createData("doubled", Seq(curated), Seq(SqlSlot(
      "SELECT day, total * 2 AS total2 FROM curated")))
    val saved = app1.saveDevState()
    assert(new java.io.File(saved.stripPrefix("file:")).exists())

    // a NEW session (fresh temp-view/catalog space) attaches the persisted
    // DAG without any re-declaration and both executes and event-triggers
    val app2 = Application.attach("devstate", spark.newSession(), root)
    val curated2 = app2.getData("curated").get
    val doubled2 = app2.getData("doubled").get
    app2.execute(curated2("2026-08-11"))
    assert(app2.load(curated2("2026-08-11")).collect().head.getDouble(1) == 6.0)
    // event path: a src partition completion cascades through BOTH nodes
    val completed = app2.processPath(s"$work/src_devstate/2026-08-12")
    assert(completed.exists(_.endsWith("doubled/2026-08-12")))
    assert(app2.load(doubled2("2026-08-12")).collect().head.getDouble(1) == 12.0)
    // the scheduled timer's cron survived too
    val sched = app2.scheduler(java.time.Instant.parse("2026-08-12T01:00:00Z"))
    assert(sched.nextFireTimes("midnight").toString == "2026-08-13T00:00:00Z")

    // a slot closure capturing a non-serializable runtime object is
    // rejected WITH the node named, not an opaque serialization failure
    val handle = new Object // not Serializable
    val app3 = new Application("devstate_bad", spark, s"$work/app_devstate_bad")
    val s3 = app3.marshalExternalData("src", s"$work/src_devstate", daySpec)
    app3.createData("bad", Seq(s3.latest(1)),
      Seq(graft.compute.ScalaSlot(c => { require(handle != null); c.input("src") })))
    val err = intercept[IllegalArgumentException](app3.saveDevState())
    assert(err.getMessage.contains("'bad'"))
  }

  test("setSecurityConf: storage mode enforced, unsatisfiable demands refuse") {
    stageDays(s"$work/src_sec", Seq("2026-08-12"))
    val app = new Application("sec", spark, s"$work/app_sec")
    val src = app.marshalExternalData("src", s"$work/src_sec", daySpec)
    val node = app.createData("secured", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.setSecurityConf(ConstructKind.Storage,
      SecurityConf(persisting = Some(PersistingSecurityDef(posixMode = "700"))))
    app.activate()
    app.execute(node("2026-08-12"))
    // the managed partition and its files carry the declared mode
    val part = new java.io.File(
      s"$work/app_sec/internal_data/secured/2026-08-12")
    assert(part.exists())
    val perms = java.nio.file.Files.getPosixFilePermissions(part.toPath)
    import java.nio.file.attribute.PosixFilePermission._
    assert(perms.contains(OWNER_READ) && !perms.contains(GROUP_READ) &&
      !perms.contains(OTHERS_READ), s"dir mode not enforced: $perms")
    val dataFile = part.listFiles().find(_.getName.startsWith("part-")).get
    val fPerms = java.nio.file.Files.getPosixFilePermissions(dataFile.toPath)
    assert(!fPerms.contains(GROUP_READ) && !fPerms.contains(OTHERS_READ) &&
      !fPerms.contains(OWNER_EXECUTE), s"file mode not enforced: $fPerms")
    assert(app.load(node("2026-08-12")).collect().head.getDouble(1) == 6.0)
    assert(app.getSecurityConf(ConstructKind.Storage).isDefined)
    // demands the local platform cannot honor refuse AT DECLARATION
    // (validation re-runs at activation too)
    val bad = new Application("sec_bad", spark, s"$work/app_sec_bad")
    assert(intercept[IllegalArgumentException](
      bad.setSecurityConf(ConstructKind.Storage, SecurityConf(
        persisting = Some(PersistingSecurityDef(
          EncryptionConf(keyAllocationLevel = "PER_RESOURCE"))))))
      .getMessage.contains("KMS"))
    assert(intercept[IllegalArgumentException](
      bad.setSecurityConf(ConstructKind.Processor,
        SecurityConf(passing = Some(PassingSecurityDef("HTTPS")))))
      .getMessage.contains("in-process"))
    assert(intercept[IllegalArgumentException](
      bad.setSecurityConf(ConstructKind.BatchCompute, SecurityConf(
        processing = Some(ProcessingSecurityDef(
          enforcePrivilegeSeparation = true)))))
      .getMessage.contains("rivilegeSeparation"))
    // an invalid posix mode is refused before any output could be written
    assert(intercept[IllegalArgumentException](
      bad.setSecurityConf(ConstructKind.Storage, SecurityConf(
        persisting = Some(PersistingSecurityDef(posixMode = "rwx")))))
      .getMessage.contains("octal"))
  }

  test("marshalExternalModel: artifact rides a ref, never becomes a view") {
    stageDays(s"$work/src_model", Seq("2026-08-12"))
    val mRoot = s"$work/models_suite"
    val fs = new org.apache.hadoop.fs.Path(mRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mDir = new org.apache.hadoop.fs.Path(s"$mRoot/2026-08-12")
    val out = fs.create(new org.apache.hadoop.fs.Path(mDir, "model.onnx"), true)
    out.write(Array.fill[Byte](8)(1)); out.close()
    fs.create(new org.apache.hadoop.fs.Path(mDir, "_SUCCESS"), true).close()

    val root = s"$work/app_model"
    val app = new Application("model", spark, root)
    val src = app.marshalExternalData("src", s"$work/src_model", daySpec)
    val model = app.marshalExternalModel("mymodel", mRoot, daySpec,
      modelMetadata = Map("algorithm" -> "onnx-net", "dim" -> "768"),
      modelFormat = "onnx")
    var seenPath: String = null
    var viewExists = true
    val node = app.createData("scored", Seq(src.latest(1), model.ref),
      Seq(ScalaSlot { ctx =>
        val ms = ctx.inputSignals("mymodel")
        seenPath = ms.materializedPaths.head
        // the artifact must NOT be registered as an input view — it is
        // opaque bytes, not a dataset
        viewExists = ctx.spark.catalog.tableExists("mymodel")
        assert(ms.source.attrs.modelMetadata("algorithm") == "onnx-net")
        assert(ms.source.attrs.modelFormat.contains("onnx"))
        ctx.input("src").groupBy("day")
          .agg(sum("amount").cast("double").as("total"))
      }))
    app.activate()
    app.execute(node("2026-08-12"))
    assert(!viewExists, "model artifact leaked into the temp-view catalog")
    assert(seenPath.endsWith("models_suite/2026-08-12"))
    assert(app.load(node("2026-08-12")).collect().head.getDouble(1) == 6.0)
    // metadata persists with the dev state (the slot closure above does
    // not — use SqlSlot/ClassSlot nodes for persistable DAGs; the
    // MARSHALED signal itself round-trips through consuming nodes)
    val sig = model.signal
    assert(sig.source.attrs.modelMetadata == Map(
      "algorithm" -> "onnx-net", "dim" -> "768"))
  }

  test("ClassSlot: compute persists by NAME and executes after attach") {
    stageDays(s"$work/src_classslot", Seq("2026-08-11"))
    val root = s"$work/app_classslot"
    val app1 = new Application("classslot", spark, root)
    val src = app1.marshalExternalData("src", s"$work/src_classslot", daySpec)
    app1.createData("tripled", Seq(src.latest(1)),
      Seq(ClassSlot("graft.app.TestTriplerSlot")))
    app1.saveDevState() // no closure — persists where ScalaSlot cannot
    val app2 = Application.attach("classslot", spark.newSession(), root)
    val n = app2.getData("tripled").get
    app2.execute(n("2026-08-11"))
    assert(app2.load(n("2026-08-11")).collect().head.getDouble(1) == 18.0)
    // Scala-object compute resolves under both name spellings
    assert(ClassSlot.resolve("graft.app.TestObjectSlot") ne null)
    assert(ClassSlot.resolve("graft.app.TestObjectSlot$") ne null)
    // unknown class fails at DECLARATION, with the class named
    val app3 = new Application("classslot_bad", spark,
      s"$work/app_classslot_bad")
    val s3 = app3.marshalExternalData("src", s"$work/src_classslot", daySpec)
    val e = intercept[IllegalArgumentException](app3.createData("bad",
      Seq(s3.latest(1)), Seq(ClassSlot("graft.app.NoSuchCompute"))))
    assert(e.getMessage.contains("not found"))
    // a resolvable class that is not a SlotFunction names the type
    val e2 = intercept[IllegalArgumentException](
      ClassSlot.resolve("java.lang.String"))
    assert(e2.getMessage.contains("SlotFunction"))
  }

  test("grant ownership: a mismatched owner is refused at import/connect " +
    "unless the grant authorizes it (authorize_external_entity analog)") {
    stageDays(s"$work/src_own", Seq("2026-08-12"))
    val appU = new Application("appU", spark, s"$work/app_own_u",
      Map("owner" -> "team-data"))
    val srcU = appU.marshalExternalData("src", s"$work/src_own", daySpec)
    val shared = appU.createData("shared", Seq(srcU.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    appU.exportToDownstream("appX", Seq(shared))

    // same grant id, FOREIGN owner -> refused with the remedy named
    val appX = new Application("appX", spark, s"$work/app_own_x",
      Map("owner" -> "team-ml"))
    val eImp = intercept[IllegalArgumentException](
      appX.importExported("in", appU.rootDir, "shared"))
    assert(eImp.getMessage.contains("authorizedOwners"), eImp.getMessage)
    val eAtt = intercept[IllegalArgumentException](
      appX.importUpstreamApplication(appU.rootDir))
    assert(eAtt.getMessage.contains("authorize"), eAtt.getMessage)
    val eCon = intercept[IllegalArgumentException](
      appU.connectDownstream(appX))
    assert(eCon.getMessage.contains("authorize"), eCon.getMessage)

    // the explicit authorization (re-export with the owner listed)
    // unlocks all three surfaces — access is granted BY NAME, never
    // implicitly
    appU.exportToDownstream("appX", Seq(shared),
      authorizedOwners = Set("team-ml"))
    val in = appX.importExported("in", appU.rootDir, "shared")
    assert(in.signal.alias == "in")
    appX.importUpstreamApplication(appU.rootDir)
    appU.connectDownstream(appX)

    // same-owner apps keep working with no authorization ceremony
    val appY = new Application("appY", spark, s"$work/app_own_y",
      Map("owner" -> "team-data"))
    appU.exportToDownstream("appY", Seq(shared))
    assert(appY.importExported("in2", appU.rootDir, "shared")
      .signal.alias == "in2")
  }

  test("downstream export: two apps share data both directions, push-wired") {
    stageDays(s"$work/src_export", Seq("2026-08-12"))
    val appA = new Application("appA", spark, s"$work/app_exp_a")
    val appB = new Application("appB", spark, s"$work/app_exp_b")

    // A: src -> curated, exported to B
    val srcA = appA.marshalExternalData("src", s"$work/src_export", daySpec)
    val curated = appA.createData("curated", Seq(srcA.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    appA.exportToDownstream("appB", Seq(curated))

    // B imports THROUGH the manifest (spec travels with the grant),
    // derives, and exports its result back to A
    val curatedIn = appB.importExported("curated_in", appA.rootDir, "curated")
    val consumer = appB.createData("consumer", Seq(curatedIn), Seq(SqlSlot(
      "SELECT day, total * 10 AS scaled FROM curated_in")))
    appB.exportToDownstream("appA", Seq(consumer))
    val consumerIn = appA.importExported("consumer_in", appB.rootDir, "consumer")
    val finalA = appA.createData("final", Seq(consumerIn), Seq(SqlSlot(
      "SELECT day, scaled + 1 AS result FROM consumer_in")))

    appA.activate(); appB.activate()
    appA.connectDownstream(appB); appB.connectDownstream(appA)

    // ONE source event cascades A.curated -> B.consumer -> A.final
    val completed = appA.processPath(s"$work/src_export/2026-08-12")
    assert(completed.exists(_.endsWith("curated/2026-08-12")))
    assert(completed.exists(_.endsWith("consumer/2026-08-12")))
    assert(completed.exists(_.endsWith("final/2026-08-12")))
    assert(appA.load(finalA("2026-08-12")).collect().head.getDouble(1) == 61.0)

    // importing a node that was never exported to this app fails fast
    val errNode = intercept[IllegalArgumentException](
      appB.importExported("nope", appA.rootDir, "final"))
    assert(errNode.getMessage.contains("does not export"))
    val appC = new Application("appC", spark, s"$work/app_exp_c")
    val errApp = intercept[IllegalArgumentException](
      appC.importExported("nope", appA.rootDir, "curated"))
    assert(errApp.getMessage.contains("exports nothing"))

    // upstream topology queries (reference import_upstream_application +
    // get_upstream_data, application.py:1767): B attaches A's whole grant
    // and queries it without importing nodes one at a time
    val manifest = appB.importUpstreamApplication(appA.rootDir)
    assert(manifest.upstreamName == "appA")
    assert(appB.getUpstreamApplications == List(("appA", appA.rootDir)))
    assert(appB.listUpstreamData == List("appA" -> List("curated")))
    val ups = appB.getUpstreamData("curated")
    assert(ups.map(_.signal.alias) == List("curated"))
    // the grant-built ref is immediately usable: load the partition A's
    // cascade materialized above
    assert(appB.load(ups.head("2026-08-12"))
      .collect().head.getDouble(1) == 6.0)
    // poll on upstream data (reference test_application_poll_on_upstream
    // _data): completion probes work across the app boundary — the
    // materialized day exists, an unmaterialized one does not
    assert(appB.poll(ups.head("2026-08-12")).nonEmpty)
    assert(appB.poll(ups.head("2030-01-01")).isEmpty)
    assert(appB.getUpstreamData("final").isEmpty) // A never exported it
    // an app with no grant cannot attach the upstream context
    intercept[IllegalArgumentException](
      appC.importUpstreamApplication(appA.rootDir))
  }

  test("route metrics: counters across success, failure, and TTL expiry") {
    stageDays(s"$work/src_metrics", Seq("2026-08-11", "2026-08-12"))
    val app = new Application("rm", spark, s"$work/app_rm")
    val src = app.marshalExternalData("src", s"$work/src_metrics", daySpec)
    val other = app.marshalExternalData("other", s"$work/never_staged", daySpec)
    app.createData("good", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.createData("flaky", Seq(src.latest(1).as("srcf")), Seq(SqlSlot(
      "SELECT * FROM table_that_does_not_exist")))
    // join whose second input never arrives -> pending node expires by TTL
    app.createData("join", Seq(src.latest(1).as("srcj"), other),
      Seq(SqlSlot("SELECT 1 AS one")), pendingNodeTtlMillis = 1)
    app.activate()

    // `good` and `join` see the event; `flaky` shares the same source so
    // its failure aborts the cascade — drive it via its own alias instead:
    // process the same physical path twice (second is a duplicate for
    // good/join but a fresh trigger attempt for flaky's run)
    val ex = intercept[Throwable](app.processPath(s"$work/src_metrics/2026-08-11"))
    assert(ex.getMessage.contains("table_that_does_not_exist") ||
      ex.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    Thread.sleep(5)
    // second event: join's stale pending node expires, a new one opens
    intercept[Throwable](app.processPath(s"$work/src_metrics/2026-08-12"))

    val good = app.getRouteMetrics("good").get
    assert(good.counters.eventsReceived == 2 && good.counters.triggers >= 1 &&
      good.execSucceeded >= 1 && good.execFailed == 0)
    val flaky = app.getRouteMetrics("flaky").get
    assert(flaky.execFailed >= 1 && flaky.execSucceeded == 0)
    val join = app.getRouteMetrics("join").get
    assert(join.counters.pendingExpired >= 1 && join.counters.triggers == 0 &&
      join.pendingNow == 1)
    assert(app.getRouteMetrics("nope").isEmpty)
    assert(app.getAllRouteMetrics.keySet == Set("good", "flaky", "join"))

    // platform metrics are a metric SERIES: orchestration health can feed
    // the alarm machinery like any emitted metric (self-monitoring)
    val pm = app.platformMetricsDf()
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(pm("route.flaky.execFailed") >= 1.0)
    assert(pm("route.good.execSucceeded") >= 1.0)
    assert(pm("route.join.pendingExpired") >= 1.0 && pm("app.routes") == 3.0)
    val alarm = app.createMetricAlarm("flaky_health",
      () => app.platformMetricsDf().where(col("name") === "route.flaky.execFailed"),
      graft.diagnostics.AlarmParams(1.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold, 1, 1),
      periodSecs = 60)
    assert(alarm.signal.alias == "flaky_health")
    val transitions = app.alarmMonitor().poll()
    assert(transitions.exists(t =>
      t.alarmId == "flaky_health" && t.state == graft.diagnostics.Alarms.ALARM))
  }

  test("sweep probe failures surface per route in metrics and dashboards (r15)") {
    val sp = spark; import sp.implicits._
    spark.sparkContext.hadoopConfiguration.set("fs.faulty.impl",
      classOf[FaultyStatusFs].getName)
    stageDays(s"$work/src_pf", Seq("2026-08-12"))
    val app = new Application("probefail", spark, s"$work/app_probefail")
    val src = app.marshalExternalData("srcpf", s"$work/src_pf", daySpec)
    val bad = app.marshalExternalData("badpf", "faulty:///poison/bad", daySpec)
    app.createData("pf",
      Seq(src.latest(1), bad.latest(1).ref.rangeCheck()),
      Seq(SqlSlot("SELECT 1 AS one")))
    app.activate()
    // event opens a pending node; the completion probe of the poisoned
    // reference range throws every sweep tick
    assert(app.processPath(s"$work/src_pf/2026-08-12").isEmpty)
    assert(app.pendingNodeCounts.getOrElse("pf", 0) == 1)
    FaultyStatusFs.armed = true
    try { app.sweep(); app.sweep() }
    finally FaultyStatusFs.armed = false
    val m = app.getRouteMetrics("pf").get
    assert(m.counters.probeFailures >= 2L,
      s"two failing ticks must count, got ${m.counters.probeFailures}")
    // the counter is a platform metric series (alarmable like any other)
    val pm = app.platformMetricsDf()
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(pm("route.pf.probeFailures") >= 2.0)
    // ... and renders on a dashboard, not only in a sampled log line
    app.createDashboard("probes")
    app.createMetricWidget("probes", "sweep probe failures",
      () => app.platformMetricsDf()
        .where(col("name") === "route.pf.probeFailures"))
    val rows = app.renderDashboard("probes").collect()
    assert(rows.exists(r => r.getAs[String]("name") == "route.pf.probeFailures"
      && r.getAs[Double]("value") >= 2.0),
      s"dashboard must render the counter: ${rows.mkString("; ")}")
  }

  test("alarm edge raised while PAUSED is retried after resume, not dropped") {
    val sp = spark; import sp.implicits._
    val app = new Application("pausedalarm", spark, s"$work/app_pausedalarm")
    val series = Seq(("m", "2026-08-11 09:00:00", 9.0))
      .toDF("name", "period_start", "value")
      .withColumn("period_start", to_timestamp(col("period_start")))
    app.createMetricAlarm("pa",
      () => series,
      graft.diagnostics.AlarmParams(5.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold, 1, 1),
      periodSecs = 3600)
    app.activate()
    app.pause()
    val mon = app.alarmMonitor()
    // the OK->ALARM edge occurs during the pause: raise must NOT be
    // silently consumed (the pre-fix process() returned Nil and the
    // monitor advanced its cursor — the edge was gone forever)
    val paused = mon.poll()
    assert(paused.isEmpty, s"no transition may be DELIVERED while paused: $paused")
    app.resume()
    val resumed = mon.poll()
    assert(resumed.exists(t => t.alarmId == "pa" &&
      t.state == graft.diagnostics.Alarms.ALARM),
      s"the held edge must deliver after resume: $resumed")
  }

  test("patchData swaps compute surgically; inputs/links/spec stay intact") {
    stageDays(s"$work/src_patch", Seq("2026-08-11", "2026-08-12"))
    val app = new Application("patch", spark, s"$work/app_patch")
    val src = app.marshalExternalData("src", s"$work/src_patch", daySpec)
    val node = app.createData("agg", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS v FROM src GROUP BY day")))
    app.activate()
    app.processPath(s"$work/src_patch/2026-08-11")
    assert(app.load(node("2026-08-11")).collect().head.getDouble(1) == 6.0)

    // swap ONLY the compute — no re-declaration of inputs/spec; takes
    // effect for the next execution through the already-active routes
    app.patchData("agg", computeTargets = Seq(SqlSlot(
      "SELECT day, CAST(MAX(amount) AS DOUBLE) AS v FROM src GROUP BY day")))
    app.processPath(s"$work/src_patch/2026-08-12")
    assert(app.load(node("2026-08-12")).collect().head.getDouble(1) == 3.0)

    intercept[IllegalArgumentException](app.patchData("nope"))
  }

  test("sweep completes a pending node when data appears without an event") {
    val sp = spark
    import sp.implicits._
    stageDays(s"$work/src_sweep", Seq("2026-08-11", "2026-08-12"))
    val app = new Application("sweep", spark, s"$work/app_sweep")
    val src = app.marshalExternalData("src", s"$work/src_sweep", daySpec)
    // 2-day ranged input with a completion check: the event for day 12
    // arrives while day 11 is still missing -> node stays pending
    val late = s"$work/late_sweep"
    val lateSrc = app.marshalExternalData("late", late, daySpec)
    val node = app.createData("sum2", Seq(src.latest(1), lateSrc.latest(1).ref.rangeCheck()),
      Seq(SqlSlot(
        """SELECT CAST(SUM(s.amount) AS DOUBLE) + CAST(SUM(l.amount) AS DOUBLE) AS total
           FROM src s, late l""")))
    app.activate()
    assert(app.processPath(s"$work/src_sweep/2026-08-12").isEmpty,
      "must stay pending while the ref range is incomplete")
    assert(app.pendingNodeCounts.getOrElse("sum2", 0) == 1)
    // the late partition lands WITHOUT any event (external writer)
    Seq(("2026-08-12", 10.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$late/2026-08-12")
    // per-route form (reference update_active_route_status): a sweep of
    // some OTHER route must not complete this one's pending node
    assert(app.sweepRoute("no_such_route").isEmpty)
    assert(app.pendingNodeCounts.getOrElse("sum2", 0) == 1)
    // no event arrives — only the orchestration-cycle sweep can finish it
    val completed = app.sweepRoute("sum2")
    assert(completed.exists(_.endsWith("sum2/2026-08-12")),
      s"sweep did not complete the pending join: $completed")
    // cross join of 3 src rows x 1 late row: sum(s)=6, sum(l)=10*3=30
    assert(app.load(node("2026-08-12")).collect().head.getDouble(0) == 36.0)
    assert(app.sweep().isEmpty) // nothing left pending

    // the background sweeper drives the same cycle: open a second pending
    // join, land its data with no event, and let the daemon finish it
    assert(app.processPath(s"$work/src_sweep/2026-08-11").isEmpty)
    app.startSweeper(pollMillis = 100)
    try {
      Seq(("2026-08-11", 5.0)).toDF("day", "amount")
        .coalesce(1).write.mode("overwrite").parquet(s"$late/2026-08-11")
      val deadline = System.currentTimeMillis() + 30000
      while (app.poll(node("2026-08-11")).isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(app.poll(node("2026-08-11")).isDefined,
        "background sweeper never completed the pending join")
    } finally app.stopSweeper()
  }

  test("pending-node surface: list, delete unblocks a stuck coincidence join") {
    val app = new Application("pend", spark, s"$work/app_pend")
    stageDays(s"$work/src_pa", Seq("2026-08-12"))
    val a = app.marshalExternalData("pa", s"$work/src_pa", daySpec)
    val b = app.marshalExternalData("pb", s"$work/src_pb", daySpec)
    app.createData("join_pend", Seq(a, b), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS total FROM pa")))
    app.activate()
    // one of two inputs arrives → a pending node forms
    app.processPath(s"$work/src_pa/2026-08-12")
    val pend = app.getPendingNodes()
    assert(pend.keySet == Set("join_pend") && pend("join_pend").length == 1)
    val node = pend("join_pend").head
    assert(node.ready.map(_.alias) == List("pa"))
    // delete by id → gone; unknown id → false
    assert(!app.deletePendingNode("join_pend", "nope"))
    assert(app.deletePendingNode("join_pend", node.id))
    assert(app.getPendingNodes().isEmpty)
    // the route still works after the manual unblock
    stageDays(s"$work/src_pb", Seq("2026-08-12"))
    app.processPath(s"$work/src_pb/2026-08-12")
    val pend2 = app.getPendingNodes("join_pend")
    assert(pend2("join_pend").head.ready.map(_.alias) == List("pb"))
  }

  test("active-route introspection + previewData") {
    val app = new Application("act", spark, s"$work/app_act")
    stageDays(s"$work/src_act", Seq("2026-08-12"))
    val src = app.marshalExternalData("src", s"$work/src_act", daySpec)
    val inSlot = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val node = app.createData("slow_act", Seq(src.latest(1)),
      Seq(graft.compute.ScalaSlot { ctx =>
        inSlot.countDown()
        release.await(30, java.util.concurrent.TimeUnit.SECONDS)
        ctx.input("src")
      }))
    app.activate()
    assert(!app.hasActiveRoutes && app.getActiveRoutes.isEmpty)
    assert(!app.hasActiveRecord(node("2026-08-12")))
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = app.executeAsync(node("2026-08-12"))
    inSlot.await(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(app.hasActiveRoutes)
    assert(app.getActiveRoutes == List("slow_act"))
    assert(app.hasActiveRecord(node("2026-08-12")))
    assert(app.hasActiveRecord(node)) // unmaterialized view: any partition
    // active/inactive compute-record split (reference
    // get_active_compute_records / get_inactive_compute_records)
    val active = app.getActiveComputeRecords()
    assert(active.map(_.routeId) == List("slow_act"))
    assert(app.getActiveComputeRecords(Some("slow_act")) == active)
    assert(app.getActiveComputeRecords(Some("other_route")).isEmpty)
    assert(app.getInactiveComputeRecords(Some("slow_act")).isEmpty) // none finished yet
    release.countDown()
    Await.result(fut, 60.seconds)
    assert(!app.hasActiveRoutes && !app.hasActiveRecord(node))
    assert(app.getActiveComputeRecords().isEmpty)
    val done = app.getInactiveComputeRecords(Some("slow_act"))
    assert(done.nonEmpty && done.forall(_.succeeded))
    assert(app.getInactiveComputeRecords(Some("slow_act"), ascending = false)
      == done.reverse)
    assert(app.getInactiveComputeRecords(Some("other_route")).isEmpty)
    // reference filter surface: trigger/deactivated windows, slot type,
    // session state, limit (application.py:4083-4098)
    val rec = done.head
    assert(app.getInactiveComputeRecords(
      triggerRange = Some((rec.startedAtMillis, rec.startedAtMillis))) == done)
    assert(app.getInactiveComputeRecords(
      triggerRange = Some((0L, rec.startedAtMillis - 1))).isEmpty)
    assert(app.getInactiveComputeRecords(
      deactivatedRange = Some((rec.finishedAtMillis, Long.MaxValue))) == done)
    assert(app.getInactiveComputeRecords(
      deactivatedRange = Some((rec.finishedAtMillis + 1, Long.MaxValue))).isEmpty)
    assert(rec.slotKinds == List("ScalaSlot"))
    assert(app.getInactiveComputeRecords(slotType = Some("ScalaSlot")) == done)
    assert(app.getInactiveComputeRecords(slotType = Some("SqlSlot")).isEmpty)
    assert(app.getInactiveComputeRecords(succeeded = Some(true)) == done)
    assert(app.getInactiveComputeRecords(succeeded = Some(false)).isEmpty)
    assert(app.getInactiveComputeRecords(ascending = false, limit = Some(1))
      == List(done.last))
    val preview = app.previewData(node("2026-08-12"), limit = 2)
    assert(preview.count() == 2 && preview.columns.contains("amount"))
  }

  test("external metric: file-backed series drives statistics and alarms") {
    val sp = spark; import sp.implicits._
    val app = new Application("extm", spark, s"$work/app_extm")
    // external store: raw rows with a sub-dimension column (host), as a
    // foreign monitoring system would emit them
    val store = s"$work/extm_store"
    Seq(
      ("latency", java.sql.Timestamp.valueOf("2026-08-10 10:00:00"), 100.0, "h1"),
      ("latency", java.sql.Timestamp.valueOf("2026-08-10 11:00:00"), 300.0, "h2"),
      ("latency", java.sql.Timestamp.valueOf("2026-08-11 10:00:00"), 500.0, "h1"))
      .toDF("name", "ts", "value", "host")
      .write.mode("overwrite").parquet(store)
    val metric = app.marshalExternalMetric("lat", store, timeFormat = "%Y-%m-%d")
    // the marshaled signal carries the four fixed metric dimensions
    assert(metric.signal.spec.flatten.flatMap(_.name) ==
      List("name", "statistic", "period", "time"))
    intercept[IllegalArgumentException](app.marshalExternalMetric("lat", store))
    // unfiltered: both hosts aggregate per day; sub-dimensioned: h1 only
    val all = app.externalMetricSeries(metric,
      graft.diagnostics.MetricStatistic.SUM, 86400L)()
      .orderBy("period_start").collect().map(_.getDouble(2)).toSeq
    assert(all == Seq(400.0, 500.0))
    val h1 = app.marshalExternalMetric("lat_h1", store,
      subDimensions = Map("host" -> "h1"))
    val h1Sum = app.externalMetricSeries(h1,
      graft.diagnostics.MetricStatistic.SUM, 86400L)()
      .orderBy("period_start").collect().map(_.getDouble(2)).toSeq
    assert(h1Sum == Seq(100.0, 500.0))
    // series from a non-metric node is rejected
    val plain = app.marshalExternalData("plain", s"$work/extm_store", daySpec)
    intercept[IllegalArgumentException](app.externalMetricSeries(plain,
      graft.diagnostics.MetricStatistic.SUM, 86400L))
    // alarm sugar: day 1 sums to 400 (OK), day 2 to 500 (>= 450 → ALARM)
    val alarm = app.createExternalMetricAlarm("lat_alarm", metric,
      graft.diagnostics.MetricStatistic.SUM,
      graft.diagnostics.AlarmParams(450.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1), 86400L,
      timeFormat = "%Y-%m-%d")
    val node = app.createData("on_lat", Seq(alarm("ALARM", "*")),
      Seq(graft.compute.SqlSlot("SELECT '{time}' AS day")))
    app.activate()
    val transitions = app.alarmMonitor().poll()
    assert(transitions.map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("OK", "2026-08-10"), ("ALARM", "2026-08-11")))
    assert(app.load(node("ALARM", "2026-08-11")).collect()
      .map(_.getString(0)).toSeq == Seq("2026-08-11"))
    // typed lookups (reference get_metric / get_alarm)
    assert(app.getMetric("lat").map(_.signal.alias).contains("lat"))
    assert(app.getMetric("lat").get.signal.spec.flatten.flatMap(_.name) ==
      List("name", "statistic", "period", "time"))
    assert(app.getMetric("nope").isEmpty)
    assert(app.getAlarm("lat_alarm").map(_.signal.alias).contains("lat_alarm"))
    assert(app.getAlarm("nope").isEmpty)
  }

  test("bidirectional non-trivial output links: execute by output partition") {
    // reference test_application_output_bidirectional_nontrivial_linking:
    // output cutoff_date = timer time - 7d, plus the DECLARED reverse link
    // (time = cutoff_date + 7d) that makes `execute(node(cutoff))` able to
    // reverse-materialize the timer input
    import graft.signal.{DimensionLink, DimRef}
    val app = new Application("bidi", spark, s"$work/app_bidi")
    val timer = app.createTimer("tick", format = "%Y-%m-%d", dimName = "time")
    val cutoffSpec = DimSpec.pretty("cutoff_date" ->
      (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
    def shift(days: Long): graft.dimension.DimValue => graft.dimension.DimValue = {
      case d: graft.dimension.DateValue => d.copy(date = d.date.plusDays(days))
      case v => v
    }
    val node = app.createData("kick", Seq(timer),
      Seq(graft.compute.SqlSlot("SELECT '{cutoff_date}' AS cd")),
      outputSpec = cutoffSpec,
      outputLinks = List(
        DimensionLink.mapped(DimRef("output", "cutoff_date"),
          DimRef("tick", "time"), shift(-7)),
        DimensionLink.mapped(DimRef("tick", "time"),
          DimRef("output", "cutoff_date"), shift(7))))
    app.activate()
    // forward: a timer tick at the 12th materializes the output at the 5th
    val fired = app.fireTimer(timer, "2026-08-12")
    assert(fired.exists(_.endsWith("kick/2026-08-05")), s"forward: $fired")
    // reverse: execute by OUTPUT partition alone — the timer input derives
    // as cutoff + 7d and the slot sees the output's own dimension value
    val out = app.execute(node("2026-08-01"))
    assert(out.endsWith("kick/2026-08-01"))
    assert(app.load(node("2026-08-01")).collect()
      .map(_.getString(0)).toSeq == Seq("2026-08-01"))
  }

  test("dangling dimension links fail fast at createData") {
    // reference output_linking_pitfalls: bad link declarations must error
    // at declaration, not surface as cryptic never-applied links later
    val app = new Application("linkval", spark, s"$work/app_linkval")
    val src = app.marshalExternalData("src", s"$work/linkval_src", daySpec)
    def slot = Seq(graft.compute.SqlSlot("SELECT 1 AS one"))
    // unknown output dimension in an output link
    val e1 = intercept[IllegalArgumentException](app.createData("c1", Seq(src),
      slot, outputLinks = List(graft.signal.DimensionLink.equals(
        graft.signal.DimRef("output", "NOT_A_DIM"),
        graft.signal.DimRef("src", "day")))))
    assert(e1.getMessage.contains("NOT_A_DIM"))
    // unknown input alias in an input link
    val e2 = intercept[IllegalArgumentException](app.createData("c2", Seq(src),
      slot, inputLinks = List(graft.signal.DimensionLink.equals(
        graft.signal.DimRef("nope", "day"), graft.signal.DimRef("src", "day")))))
    assert(e2.getMessage.contains("nope"))
    // unknown dim on a real input
    val e3 = intercept[IllegalArgumentException](app.createData("c3", Seq(src),
      slot, inputLinks = List(graft.signal.DimensionLink.equals(
        graft.signal.DimRef("src", "hour"), graft.signal.DimRef("src", "day")))))
    assert(e3.getMessage.contains("hour"))
    // 'output' refs are rejected inside inputLinks
    val e4 = intercept[IllegalArgumentException](app.createData("c4", Seq(src),
      slot, inputLinks = List(graft.signal.DimensionLink.equals(
        graft.signal.DimRef("output", "day"), graft.signal.DimRef("src", "day")))))
    assert(e4.getMessage.contains("outputLinks"))
    // a correct declaration still goes through
    app.createData("ok", Seq(src), slot,
      outputLinks = List(graft.signal.DimensionLink.equals(
        graft.signal.DimRef("output", "day"), graft.signal.DimRef("src", "day"))))
  }

  test("internal metric: declare, emit, alarm, and trigger downstream") {
    val app = new Application("intm", spark, s"$work/app_intm")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two groups — the reference's create_metric docstring semantics: the
    // same Name emitted under different groups never contributes to the
    // same metric instance
    val g1 = app.createMetric("metric_group1", timeFormat = "%Y-%m-%d")
    val g2 = app.createMetric("metric_group2", timeFormat = "%Y-%m-%d")
    assert(g1.signal.spec.flatten.flatMap(_.name) ==
      List("name", "statistic", "period", "time"))
    intercept[IllegalArgumentException](app.createMetric("metric_group1"))
    // id namespace is shared with external metrics both ways
    intercept[IllegalArgumentException](
      app.marshalExternalMetric("metric_group1", s"$work/nowhere"))
    assert(app.getMetric("metric_group1").map(_.signal.alias)
      .contains("metric_group1"))
    val alarm = app.createInternalMetricAlarm("g1_err", g1, "Error",
      graft.diagnostics.MetricStatistic.SUM,
      graft.diagnostics.AlarmParams(2.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1), 86400L,
      timeFormat = "%Y-%m-%d")
    val node = app.createData("on_g1_err", Seq(alarm("ALARM", "*")),
      Seq(graft.compute.SqlSlot("SELECT '{time}' AS day")))
    app.activate()
    // emissions into group2 must NOT alarm group1 even under the same Name
    app.diagnostics("metric_group2")("Error").emit(5.0, ts("2026-08-10 10:00:00"))
    val monitor = app.alarmMonitor()
    assert(monitor.poll().isEmpty)
    // group1 breach: 1.0 + 2.0 on the 11th sums past the threshold
    app.diagnostics("metric_group1")("Error").emit(1.0, ts("2026-08-11 09:00:00"))
    app.diagnostics("metric_group1")("Error").emit(2.0, ts("2026-08-11 15:00:00"))
    // an emission under a DIFFERENT Name in group1 stays out of the series
    app.diagnostics("metric_group1")("Success").emit(100.0, ts("2026-08-11 16:00:00"))
    val transitions = app.alarmMonitor().poll()
    assert(transitions.map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("ALARM", "2026-08-11")))
    assert(app.load(node("ALARM", "2026-08-11")).collect()
      .map(_.getString(0)).toSeq == Seq("2026-08-11"))
    // the full-group series (name = None) sees both Names
    val all = app.internalMetricSeries(g1,
      graft.diagnostics.MetricStatistic.SUM, 86400L)()
      .orderBy("name").collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(all == Seq(("Error", 3.0), ("Success", 100.0)))
    // a series over an undeclared group is rejected
    intercept[IllegalArgumentException](app.internalMetricSeries(
      app.marshalExternalData("plainx", s"$work/nowhere", daySpec),
      graft.diagnostics.MetricStatistic.SUM, 86400L))
  }

  test("composite alarm: rule over member alarms raises and triggers downstream") {
    import graft.diagnostics._
    val app = new Application("compa", spark, s"$work/app_compa")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val errs = app.createMetric("errs", timeFormat = "%Y-%m-%d")
    val deploys = app.createMetric("deploys", timeFormat = "%Y-%m-%d")
    def alarmOn(id: String, g: NodeRef) = app.createInternalMetricAlarm(
      id, g, "n", MetricStatistic.SUM,
      AlarmParams(1.0, AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1), 86400L,
      timeFormat = "%Y-%m-%d")
    alarmOn("err_alarm", errs)
    alarmOn("deploy_alarm", deploys)
    // page only when errors fire OUTSIDE a deploy window
    import AlarmRule._
    val page = app.createCompositeAlarm("page",
      Ref("err_alarm") & ~Ref("deploy_alarm"), timeFormat = "%Y-%m-%d")
    assert(app.getAlarm("page").map(_.signal.alias).contains("page"))
    // composite-of-composite: an earlier composite is a valid member
    app.createCompositeAlarm("meta_page",
      Ref("page") & Ref("err_alarm"), timeFormat = "%Y-%m-%d")
    // an undeclared member or duplicate id fails fast, in BOTH directions
    intercept[IllegalArgumentException](
      app.createCompositeAlarm("bad", Ref("nope")))
    intercept[IllegalArgumentException](
      app.createCompositeAlarm("page", Ref("err_alarm")))
    intercept[IllegalArgumentException](alarmOn("page", errs))
    val node = app.createData("on_page", Seq(page("ALARM", "*")),
      Seq(graft.compute.SqlSlot("SELECT '{time}' AS day")))
    app.activate()
    // day 1: errors during a deploy — members alarm, composite stays OK
    app.diagnostics("errs")("n").emit(5.0, ts("2026-08-10 10:00:00"))
    app.diagnostics("deploys")("n").emit(1.0, ts("2026-08-10 11:00:00"))
    // day 2: errors with NO deploy — the composite pages
    app.diagnostics("errs")("n").emit(3.0, ts("2026-08-11 09:00:00"))
    app.diagnostics("deploys")("n").emit(0.0, ts("2026-08-11 09:00:00"))
    val transitions = app.alarmMonitor().poll()
    val pageTs = transitions.filter(_.alarmId == "page")
    assert(pageTs.map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("OK", "2026-08-10"), ("ALARM", "2026-08-11")))
    // the nested composite follows its member composite's day-2 edge
    assert(transitions.filter(_.alarmId == "meta_page")
      .map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("OK", "2026-08-10"), ("ALARM", "2026-08-11")))
    assert(app.load(node("ALARM", "2026-08-11")).collect()
      .map(_.getString(0)).toSeq == Seq("2026-08-11"))
    // the dashboard renders composite state like any declared alarm
    app.createDashboard("ops")
    app.createAlarmWidget("ops", page)
    val rendered = app.renderDashboard("ops").collect()
    assert(rendered.exists(r => r.getAs[String]("name") == "page" &&
      r.getAs[String]("text") == "ALARM"), rendered.mkString("; "))
  }

  test("partitioned external metric: a poll reads only partitions past the cursor") {
    val sp = spark; import sp.implicits._
    val app = new Application("extc", spark, s"$work/app_extc")
    val store = s"$work/extc_store"
    def writeDay(day: String, v: Double): Unit =
      Seq(("m", java.sql.Timestamp.valueOf(s"$day 10:00:00"), v))
        .toDF("name", "ts", "value")
        .write.mode("overwrite").parquet(s"$store/day=$day")
    writeDay("2026-08-01", 1.0); writeDay("2026-08-02", 2.0)
    writeDay("2026-08-03", 3.0)
    val metric = app.marshalExternalMetric("m", store,
      partitionCol = Some("day"), partitionFormat = "%Y-%m-%d")
    val series = app.externalMetricSeries(metric,
      graft.diagnostics.MetricStatistic.SUM, 86400L)
    // first poll establishes the frontier over the full history
    val first = series()
    assert(first.orderBy("period_start").collect()
      .map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 3.0))
    assert(first.inputFiles.exists(_.contains("day=2026-08-01")))
    // the producer appends two partitions; the next poll must list but
    // NOT scan the closed history — only the open frontier partition
    // (producers may still append into it) and the new ones
    writeDay("2026-08-04", 4.0); writeDay("2026-08-05", 5.0)
    val second = series()
    val files = second.inputFiles
    assert(!files.exists(f =>
      f.contains("day=2026-08-01") || f.contains("day=2026-08-02")))
    assert(files.exists(_.contains("day=2026-08-03")))
    assert(files.exists(_.contains("day=2026-08-04")))
    assert(files.exists(_.contains("day=2026-08-05")))
    assert(second.orderBy("period_start").collect()
      .map(_.getDouble(2)).toSeq == Seq(3.0, 4.0, 5.0))
    // lookback keeps the alarm's N-of-M trailing window readable: with
    // lookbackPeriods=2 (daily periods) the poll also retains 08-02
    val look = app.externalMetricSeries(metric,
      graft.diagnostics.MetricStatistic.SUM, 86400L, lookbackPeriods = 2)
    look() // establish frontier at 08-05
    writeDay("2026-08-06", 6.0)
    val third = look()
    assert(!third.inputFiles.exists(_.contains("day=2026-08-01")))
    assert(third.inputFiles.exists(_.contains("day=2026-08-03")))
    assert(third.orderBy("period_start").collect()
      .map(_.getDouble(2)).toSeq == Seq(3.0, 4.0, 5.0, 6.0))
  }

  test("alarm window anchors at the monitor's cursor under raise failures") {
    val sp = spark; import sp.implicits._
    val app = new Application("extrf", spark, s"$work/app_extrf")
    val store = s"$work/extrf_store"
    def writeDay(day: String, v: Double): Unit =
      Seq(("m", java.sql.Timestamp.valueOf(s"$day 10:00:00"), v))
        .toDF("name", "ts", "value")
        .write.mode("overwrite").parquet(s"$store/day=$day")
    writeDay("2026-08-01", 1.0) // OK
    writeDay("2026-08-02", 9.0) // ALARM edge — its raise will fail below
    val metric = app.marshalExternalMetric("m", store,
      partitionCol = Some("day"), partitionFormat = "%Y-%m-%d")
    val alarm = app.createExternalMetricAlarm("m_alarm", metric,
      graft.diagnostics.MetricStatistic.SUM,
      graft.diagnostics.AlarmParams(5.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1), 86400L,
      timeFormat = "%Y-%m-%d")
    @volatile var fail = true
    val node = app.createData("on_alarm", Seq(alarm("ALARM", "*")),
      Seq(graft.compute.ScalaSlot { c =>
        if (fail) sys.error("downstream outage")
        Seq(1).toDF("one")
      }))
    app.activate()
    val mon = app.alarmMonitor()
    // poll 1: OK@08-01 consumes; ALARM@08-02's raise throws → pending
    assert(mon.poll().map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("OK", "2026-08-01")))
    // the producer races ahead by MORE than the lookback window (1
    // period) while raises keep failing; a dashboard render also reads
    // the same series — neither may advance the window past the
    // unconsumed 08-02 row
    writeDay("2026-08-03", 9.0); writeDay("2026-08-04", 9.0)
    writeDay("2026-08-05", 9.0)
    app.createDashboard("ops"); app.createAlarmWidget("ops", alarm)
    app.renderDashboard("ops").collect()
    assert(mon.poll().isEmpty) // still failing, still pending
    // outage over: the pending 08-02 edge must raise NOW — pre-fix the
    // advanced frontier had pushed 08-02 out of the read window and the
    // transition silently vanished
    fail = false
    assert(mon.poll().map(t => (t.state, t.period.toLocalDate.toString)) ==
      List(("ALARM", "2026-08-02")))
    assert(app.load(node("ALARM", "2026-08-02")).collect()
      .map(_.getInt(0)).toSeq == Seq(1))
  }

  test("dashboards: text + metric + alarm widgets render into one frame") {
    val sp = spark; import sp.implicits._
    val app = new Application("dash", spark, s"$work/app_dash")
    val series = () => Seq(
      ("lat.p99", java.sql.Timestamp.valueOf("2026-08-12 10:00:00"), 120.0),
      ("lat.p99", java.sql.Timestamp.valueOf("2026-08-12 11:00:00"), 450.0))
      .toDF("name", "period_start", "value")
    val alarm = app.createMetricAlarm("lat_alarm", series,
      graft.diagnostics.AlarmParams(
        threshold = 300.0,
        comparison = graft.diagnostics.AlarmComparison.GreaterThanThreshold,
        evaluationPeriods = 1, datapointsToAlarm = 1),
      periodSecs = 3600)
    app.createDashboard("ops")
    intercept[IllegalArgumentException](app.createDashboard("ops"))
    intercept[IllegalArgumentException](
      app.createTextWidget("nope", "missing"))
    app.createTextWidget("ops", "# Service health")
    app.createMetricWidget("ops", "latency", series)
    app.createAlarmWidget("ops", alarm)
    // a non-declared alarm is rejected like the reference's type check
    intercept[IllegalArgumentException](
      app.createAlarmWidget("ops", app.marshalAlarm("ghost")))
    assert(app.listDashboards == List("ops"))
    val rows = app.renderDashboard("ops").collect()
    val byKind = rows.groupBy(_.getString(1))
    assert(byKind("text").head.getString(6) == "# Service health")
    assert(byKind("metric").length == 2 &&
      byKind("metric").map(_.getDouble(5)).toSet == Set(120.0, 450.0))
    // latest period breaches 300 → ALARM state in the status row
    val alarmRow = byKind("alarm").head
    assert(alarmRow.getString(3) == "lat_alarm" && alarmRow.getString(6) == "ALARM")
  }

  test("topology queries: id pattern, path search, dimension compatibility") {
    val app = new Application("topo", spark, s"$work/app_topo")
    val regionDaySpec = DimSpec.pretty(
      "region" -> (DimType.STRING, Map.empty[String, Any]),
      "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
    val longSpec = DimSpec.pretty(
      "shard" -> (DimType.LONG, Map.empty[String, Any]))
    val src = app.marshalExternalData("src", s"$work/src_topo", daySpec)
    app.createData("daily_agg", Seq(src.latest(1)), Seq(SqlSlot("SELECT 1 AS one FROM src")))
    app.createData("daily_agg_v2", Seq(src.latest(1).as("s2")), Seq(SqlSlot("SELECT 1 AS one FROM s2")),
      outputSpec = daySpec)
    app.createData("regional", Seq(src.latest(1).as("s3")), Seq(SqlSlot("SELECT 1 AS one FROM s3")),
      outputSpec = regionDaySpec)
    app.createData("sharded", Seq(src.latest(1).as("s4")), Seq(SqlSlot("SELECT 1 AS one FROM s4")),
      outputSpec = longSpec)
    // id pattern: substring vs exact
    assert(app.queryData("daily_agg").keySet == Set("daily_agg", "daily_agg_v2"))
    assert(app.queryData("daily_agg", exact = true).keySet == Set("daily_agg"))
    // path fragment finds the node through its access spec
    assert(app.searchData("app_topo/internal_data/regional").map(_.signal.alias) == List("regional"))
    // dimension compatibility: a date matches the DATETIME-keyed nodes
    // (prefix-match for regional's (region, day) is rejected — "2026-08-12"
    // is not a region STRING followed by nothing parseable)
    val byDay = app.queryDataByDimensions("2026-08-12").keySet
    assert(byDay.contains("daily_agg") && byDay.contains("daily_agg_v2"))
    assert(!byDay.contains("sharded"), "a LONG shard key must not accept a date")
    // (region, day) tuple matches only the regional node among the typed ones
    val byRegionDay = app.queryDataByDimensions("NA", "2026-08-12").keySet
    assert(byRegionDay.contains("regional") && !byRegionDay.contains("daily_agg"))
    assert(!byRegionDay.contains("sharded"))
    // a long value matches the sharded node, not the datetime ones
    val byShard = app.queryDataByDimensions(42L).keySet
    assert(byShard.contains("sharded") && !byShard.contains("daily_agg"))
  }

  test("delete() removes managed data; recreate on the same root starts clean") {
    val root = s"$work/app_delete"
    stageDays(s"$work/src_del", Seq("2026-08-12"))
    val app = new Application("del", spark, root)
    val src = app.marshalExternalData("src", s"$work/src_del", daySpec)
    val node = app.createData("sum_del", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS total FROM src")))
    app.activate()
    app.execute(node("2026-08-12"))
    app.saveDevState()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/internal_data")))
    // only an INACTIVE app may delete (the petabyte safeguard)
    intercept[IllegalArgumentException](app.delete())
    app.terminate()
    app.delete()
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root)),
      "delete must remove internal data, WAL, and dev state")
    // the deleted handle refuses further use
    intercept[IllegalArgumentException](app.activate())
    intercept[IllegalArgumentException](app.execute(node("2026-08-12")))
    // a reincarnation on the same root starts clean and works
    val app2 = new Application("del", spark, root)
    assert(!app2.loadDevState(), "dev state must be gone after delete")
    val src2 = app2.marshalExternalData("src", s"$work/src_del", daySpec)
    val node2 = app2.createData("sum_del", Seq(src2.latest(1)), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS total FROM src")))
    app2.activate()
    app2.execute(node2("2026-08-12"))
    assert(app2.load(node2("2026-08-12")).collect().head.getDouble(0) == 6.0)
  }

  test("refresh() re-syncs the dev context from persisted state") {
    val root = s"$work/app_refresh"
    stageDays(s"$work/src_rf", Seq("2026-08-12"))
    // session A declares v1 (SUM) and persists
    val appA = new Application("rf", spark, root)
    val srcA = appA.marshalExternalData("src", s"$work/src_rf", daySpec)
    appA.createData("agg_rf", Seq(srcA.latest(1)), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS total FROM src")))
    appA.saveDevState()
    // session B attaches, sees v1
    val appB = Application.attach("rf", spark, root)
    appB.activate()
    // session A revises to v2 (MAX) and persists again
    appA.updateData("agg_rf", Seq(srcA.latest(1)), Seq(SqlSlot(
      "SELECT CAST(MAX(amount) AS DOUBLE) AS total FROM src")))
    appA.saveDevState()
    // B's plain refresh re-syncs the declared context; fullStack
    // recompiles routing so execute uses the NEW slot
    assert(appB.refresh(fullStack = true))
    val out = appB.execute(appB.getData("agg_rf").get.apply("2026-08-12"))
    assert(appB.load(appB.getData("agg_rf").get.apply("2026-08-12"))
      .collect().head.getDouble(0) == 3.0, s"expected MAX slot after refresh ($out)")
    // refresh on a root with no persisted state is a no-op returning false
    val bare = new Application("rf2", spark, s"$work/app_refresh_bare")
    assert(!bare.refresh())
  }

  test("CSV encoding attr round-trips non-UTF8 text (reference `encoding`)") {
    // ISO-8859-1 bytes are NOT valid UTF-8 for accented chars — a reader
    // ignoring the attr produces replacement garbage, failing the equality
    val csvRoot = s"$work/src_latin1/2026-08-12"
    new java.io.File(csvRoot).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$csvRoot/data.csv"),
      "day|city\n2026-08-12|Zürich\n2026-08-12|München\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val app = new Application("latin1", spark, s"$work/app_latin1")
    val src = app.marshalExternalData("src", s"$work/src_latin1", daySpec,
      attrs = DatasetAttrs(format = "csv", delimiter = "|", header = true,
        encoding = Some("ISO-8859-1")))
    // managed output ALSO written as latin-1 csv: the writer-side half
    val node = app.createData("latin1_out", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT city FROM src")),
      attrs = DatasetAttrs(format = "csv", delimiter = "|", header = true,
        encoding = Some("ISO-8859-1")))
    app.activate()
    app.execute(node("2026-08-12"))
    val cities = app.load(node("2026-08-12"))
      .collect().map(_.getString(0)).sorted
    assert(cities.toSeq == Seq("München", "Zürich"))
    // the managed partition's raw bytes really are latin-1 (ü = 0xFC)
    val outDir = new java.io.File(app.poll(node("2026-08-12")).get)
    val part = outDir.listFiles().find(_.getName.startsWith("part-")).get
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    assert(bytes.contains(0xFC.toByte))
    assert(!bytes.containsSlice(Array(0xC3.toByte, 0xBC.toByte))) // no UTF-8 ü
  }

  test("CSV external input honors delimiter/header attrs") {
    val csvRoot = s"$work/src_csv/2026-08-12"
    new java.io.File(csvRoot).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$csvRoot/data.csv"),
      "day|amount\n2026-08-12|5.0\n2026-08-12|7.0\n")
    val app = new Application("csv", spark, s"$work/app_csv")
    val src = app.marshalExternalData("src", s"$work/src_csv", daySpec,
      attrs = DatasetAttrs(format = "csv", delimiter = "|", header = true))
    val node = app.createData("csv_agg", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT CAST(SUM(CAST(amount AS DOUBLE)) AS DOUBLE) AS total FROM src")))
    app.activate()
    app.execute(node("2026-08-12"))
    assert(app.load(node("2026-08-12")).collect().head.getDouble(0) == 12.0)
  }
}

/** ClassSlot test compute: triple the day's total (plain class form). */
final class TestTriplerSlot extends SlotFunction {
  override def apply(ctx: SlotContext): org.apache.spark.sql.DataFrame =
    ctx.input("src").groupBy("day")
      .agg((sum("amount") * 3).cast("double").as("total3"))
}

/** ClassSlot test compute: Scala `object` form. */
object TestObjectSlot extends SlotFunction {
  override def apply(ctx: SlotContext): org.apache.spark.sql.DataFrame =
    ctx.input("src")
}
