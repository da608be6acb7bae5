package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.app.Application
import graft.compute.SqlSlot
import graft.dimension.{DimSpec, DimType}

class StreamingSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _
  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  override def beforeAll(): Unit = {
    work = Files.createTempDirectory("graft_stream_test").toString
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("marker stream drives the routing table from _SUCCESS events") {
    val sp = spark
    import sp.implicits._
    // stage two day partitions WITH markers (parquet write emits _SUCCESS)
    val srcRoot = s"$work/stream_src"
    Seq("2026-08-11", "2026-08-12").foreach { d =>
      Seq((d, 1.0), (d, 2.0)).toDF("day", "amount")
        .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$d")
    }
    val app = new Application("stream", spark, s"$work/app_stream")
    val src = app.marshalExternalData("src", srcRoot, daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()

    val q = new MarkerStream(app, Seq(srcRoot), s"$work/ckpt1").start()
    q.awaitTermination(60000)
    // both day partitions' completion markers triggered the node
    assert(app.poll(node("2026-08-11")).isDefined)
    assert(app.poll(node("2026-08-12")).isDefined)
    assert(app.load(node("2026-08-12")).collect().head.getDouble(1) == 3.0)
  }

  test("vendor marker (manifest.json) triggers streaming ingest — even " +
    "with no part-* data files (r17 FileCheck alternatives)") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/stream_vendor_src"
    val day = "2026-08-12"
    Seq((day, 4.0), (day, 5.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$day")
    // vendor layout: data file NOT part-* named, completion is
    // manifest.json, no _SUCCESS anywhere
    val dir = new java.io.File(s"$srcRoot/$day")
    val part = dir.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(dir, "chunk-0.parquet")))
    dir.listFiles().filter(f => f.getName.startsWith("_") ||
      f.getName.startsWith(".")).foreach(_.delete())
    // NON-empty on purpose: Spark's binaryFile source skips zero-length
    // files, so only a marker with content (as real vendor manifests
    // have) is streamable — documented at MarkerStream.markers
    val mw = new java.io.FileWriter(new java.io.File(dir, "manifest.json"))
    try mw.write("""{"rows": 2}""") finally mw.close()

    val app = new Application("stream_vendor", spark,
      s"$work/app_stream_vendor")
    val src = app.marshalExternalData("src", srcRoot, daySpec,
      protocol = graft.signal.IntegrityProtocol
        .FileCheck("_SUCCESS", "manifest.json"))
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()

    new MarkerStream(app, Seq(srcRoot), s"$work/ckpt_vendor",
      markers = Seq("_SUCCESS", "manifest.json")).start()
      .awaitTermination(60000)
    assert(app.poll(node(day)).isDefined,
      "manifest.json-completed partition did not trigger")
    assert(app.load(node(day)).collect().head.getDouble(1) == 9.0)
  }

  test("watch() pre-seeds expected dirs: an EMPTY vendor marker with no " +
    "streamable files still gates and triggers") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/stream_watch_src"
    val day = "2026-08-12"
    Seq((day, 7.0), (day, 1.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$day")
    val dir = new java.io.File(s"$srcRoot/$day")
    val part = dir.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(dir, "blob-0.parquet")))
    dir.listFiles().filter(f => f.getName.startsWith("_") ||
      f.getName.startsWith(".")).foreach(_.delete())

    val app = new Application("stream_watch", spark,
      s"$work/app_stream_watch")
    val src = app.marshalExternalData("src", srcRoot, daySpec,
      protocol = graft.signal.IntegrityProtocol
        .FileCheck("_SUCCESS", "manifest.json"))
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()

    val ms = new MarkerStream(app, Seq(srcRoot), s"$work/ckpt_watch",
      markers = Seq("_SUCCESS", "manifest.json"))
    // dir registered before its marker exists: stays pending
    ms.watch(Seq(s"$srcRoot/$day"))
    assert(app.poll(node(day)).isEmpty)
    // the EMPTY marker lands (unstreamable); only watch()'s pending set
    // plus the marker re-check can redeem this completion
    new java.io.FileOutputStream(
      new java.io.File(dir, "manifest.json")).close()
    ms.recheckPending()
    assert(app.poll(node(day)).isDefined,
      "watched empty-marker partition did not trigger")
    assert(app.load(node(day)).collect().head.getDouble(1) == 8.0)
  }

  test("watchUpcoming derives the expected dirs from the dimension spec: " +
    "an empty-marker vendor feed needs only root + protocol (r18)") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/stream_upcoming_src"
    val anchor = java.time.LocalDateTime.of(2026, 8, 12, 0, 0)
    val day = "2026-08-13" // anchor + 1: inside the derived window
    Seq((day, 2.0), (day, 4.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$day")
    val dir = new java.io.File(s"$srcRoot/$day")
    val part = dir.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(dir, "blob-0.parquet")))
    dir.listFiles().filter(f => f.getName.startsWith("_") ||
      f.getName.startsWith(".")).foreach(_.delete())

    val app = new Application("stream_upc", spark,
      s"$work/app_stream_upc")
    val src = app.marshalExternalData("src", srcRoot, daySpec,
      protocol = graft.signal.IntegrityProtocol
        .FileCheck("_SUCCESS", "manifest.json"))
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()

    val ms = new MarkerStream(app, Seq(srcRoot), s"$work/ckpt_upcoming",
      markers = Seq("_SUCCESS", "manifest.json"))
    // NO explicit dir list: the next 3 days derive from the declared spec
    ms.watchUpcoming(src, periods = 3, anchor = Some(anchor))
    assert(app.poll(node(day)).isEmpty)
    // the EMPTY marker lands (unstreamable) in a derived-watched dir
    new java.io.FileOutputStream(
      new java.io.File(dir, "manifest.json")).close()
    ms.recheckPending()
    assert(app.poll(node(day)).isDefined,
      "derived-watched empty-marker partition did not trigger")
    assert(app.load(node(day)).collect().head.getDouble(1) == 6.0)
    // a spec with no datetime dimension refuses loudly
    val flat = app.marshalExternalData("flat", s"$work/flat_src",
      graft.dimension.DimSpec.pretty(
        "region" -> (graft.dimension.DimType.STRING,
          Map[String, Any]())))
    val e = intercept[IllegalArgumentException] {
      ms.watchUpcoming(flat, periods = 2)
    }
    assert(e.getMessage.contains("DATETIME"), e.getMessage)
  }

  test("watchUpcoming steps hour and month granularities and is " +
    "DST-correct under a declared timezone (r19, VERDICT r18 #6)") {
    // The derived-dir path shares the F2 stepping, which is granularity-
    // and tz-aware; these pins keep it that way. The pending set is the
    // observable: watchUpcoming registers dirs there, durably.
    val app = new Application("stream_gran", spark, s"$work/app_stream_gran")
    def pendingOf(ckpt: String): Seq[String] = {
      val f = java.nio.file.Paths.get(ckpt, "_graft_pending_dirs")
      assert(java.nio.file.Files.exists(f), s"no pending file at $f")
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(f)).asScala.toList
        .filter(_.nonEmpty).map(_.split('/').last).sorted
    }
    // HOUR granularity rolls over midnight
    val hourSpec = DimSpec.pretty("hour" -> (DimType.DATETIME,
      Map[String, Any]("format" -> "%Y-%m-%d-%H", "granularity" -> "HOUR")))
    val srcH = app.marshalExternalData("uph", s"$work/uph_src", hourSpec)
    val msH = new MarkerStream(app, Seq(s"$work/uph_src"), s"$work/ckpt_uph")
    msH.watchUpcoming(srcH, periods = 3,
      anchor = Some(java.time.LocalDateTime.of(2026, 8, 12, 22, 0)))
    assert(pendingOf(s"$work/ckpt_uph") ==
      Seq("2026-08-12-22", "2026-08-12-23", "2026-08-13-00"))
    // MONTH granularity rolls over the year
    val monthSpec = DimSpec.pretty("month" -> (DimType.DATETIME,
      Map[String, Any]("format" -> "%Y-%m", "granularity" -> "MONTH")))
    val srcM = app.marshalExternalData("upm", s"$work/upm_src", monthSpec)
    val msM = new MarkerStream(app, Seq(s"$work/upm_src"), s"$work/ckpt_upm")
    msM.watchUpcoming(srcM, periods = 3,
      anchor = Some(java.time.LocalDateTime.of(2026, 11, 15, 0, 0)))
    assert(pendingOf(s"$work/ckpt_upm") ==
      Seq("2026-11", "2026-12", "2027-01"))
    // spring-forward: America/New_York 2026-03-08 02:xx does not exist;
    // zone-aware hour stepping lands 01 -> 03 -> 04, never emitting an
    // impossible 02 partition (naive LocalDateTime.plusHours would)
    val dstSpec = DimSpec.pretty("hour" -> (DimType.DATETIME,
      Map[String, Any]("format" -> "%Y-%m-%d-%H", "granularity" -> "HOUR",
        "timezone" -> "America/New_York")))
    val srcD = app.marshalExternalData("upd", s"$work/upd_src", dstSpec)
    val msD = new MarkerStream(app, Seq(s"$work/upd_src"), s"$work/ckpt_upd")
    msD.watchUpcoming(srcD, periods = 3,
      anchor = Some(java.time.LocalDateTime.of(2026, 3, 8, 1, 0)))
    assert(pendingOf(s"$work/ckpt_upd") ==
      Seq("2026-03-08-01", "2026-03-08-03", "2026-03-08-04"))
    // fall-back: 01:00 occurs twice (EDT then EST) but renders to ONE
    // partition dir — the pending set dedupes; three periods yield two
    // dirs, no phantom third hour
    val srcF = app.marshalExternalData("upf", s"$work/upf_src", dstSpec)
    val msF = new MarkerStream(app, Seq(s"$work/upf_src"), s"$work/ckpt_upf")
    msF.watchUpcoming(srcF, periods = 3,
      anchor = Some(java.time.LocalDateTime.of(2026, 11, 1, 1, 0)))
    assert(pendingOf(s"$work/ckpt_upf") ==
      Seq("2026-11-01-01", "2026-11-01-02"))
  }

  test("marker stream feeds a sharded deployment across drivers") {
    val sp = spark
    import sp.implicits._
    // the consuming route lives on shard 1, owned by driver B; the
    // marker stream watches on driver A — stream-observed completions
    // must cross drivers through the inbox like any other path event
    val nodeId = (0 to 99).map(i => s"st_daily_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 1).get
    val srcRoot = s"$work/shstream_src"
    Seq(("2026-08-12", 1.0), ("2026-08-12", 2.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/2026-08-12")
    val root = s"$work/app_shstream"
    def mkDriver(): Application = {
      val app = new Application("shstream", spark, root)
      val src = app.marshalExternalData("src", srcRoot, daySpec)
      app.createData(nodeId, Seq(src.latest(1)), Seq(SqlSlot(
        "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
      app
    }
    val dA = mkDriver(); val dB = mkDriver()
    dA.activateSharded("A", 2, shards = Some(Set(0)))
    dB.activateSharded("B", 2, shards = Some(Set(1)))
    new MarkerStream(dA, Seq(srcRoot), s"$work/ckpt_sharded").start()
      .awaitTermination(60000)
    // A owns no consuming shard — the stream forwarded, nothing ran here
    assert(dA.getInactiveComputeRecords().isEmpty)
    val done = dB.shardedCycle()
    assert(done.exists(_.endsWith(s"$nodeId/2026-08-12")),
      s"stream event did not cross drivers: $done")
    val node = dB.getData(nodeId).get
    assert(dB.load(node("2026-08-12")).collect().head.getDouble(1) == 3.0)
    dA.terminate(); dB.terminate()
  }

  test("late _SUCCESS marker still fires the completion (pending re-check)") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/stream_late_src"
    val day = "2026-08-12"
    Seq((day, 1.0), (day, 2.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$day")
    // simulate data files landing BEFORE the completion marker
    val marker = new java.io.File(s"$srcRoot/$day/_SUCCESS")
    assert(marker.delete())

    val app = new Application("stream_late", spark, s"$work/app_stream_late")
    val src = app.marshalExternalData("src", srcRoot, daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()

    val ms = new MarkerStream(app, Seq(srcRoot), s"$work/ckpt_late")
    ms.start().awaitTermination(60000)
    assert(app.poll(node(day)).isEmpty) // marker absent: must NOT fire yet

    // the marker lands late — no new part-* row will ever be emitted, so
    // only the carried-over pending set can redeem this completion
    assert(marker.createNewFile())
    ms.recheckPending()
    assert(app.poll(node(day)).isDefined)
    assert(app.load(node(day)).collect().head.getDouble(1) == 3.0)
  }

  test("long-lived ProcessingTime watcher picks up partitions created later") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/stream_live_src"
    val d1 = "2026-08-11"
    Seq((d1, 1.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$d1")
    val app = new Application("stream_live", spark, s"$work/app_stream_live")
    val src = app.marshalExternalData("src", srcRoot, daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()
    // a partition that lands AFTER the watcher started
    val d2 = "2026-08-12"
    // under full-suite CPU oversubscription the micro-batch engine can die
    // reading its own just-created offset log (empty-file race) — retry
    // with a fresh checkpoint; the behavior under test is unaffected
    var attempt = 0
    while (app.poll(node(d2)).isEmpty && attempt < 3) {
      attempt += 1
      // the whole attempt is fallible: the engine can ALSO die inside
      // start() (offset/metadata-log read race) — an uncaught throw
      // there escaped the retry loop entirely and failed the test on a
      // pure engine flake
      scala.util.Try {
        val q = new MarkerStream(app, Seq(srcRoot), s"$work/ckpt_live_$attempt")
          .start(org.apache.spark.sql.streaming.Trigger.ProcessingTime("300 milliseconds"))
        try {
          Seq((d2, 2.0), (d2, 3.0)).toDF("day", "amount")
            .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$d2")
          val deadline = System.currentTimeMillis() + 60000
          while (app.poll(node(d2)).isEmpty && q.exception.isEmpty &&
                 System.currentTimeMillis() < deadline)
            Thread.sleep(250)
        } finally scala.util.Try(q.stop())
      }.failed.foreach(e => System.err.println(
        s"[stream-live] attempt $attempt died (engine flake, retrying): " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
    assert(app.poll(node(d2)).isDefined, "late partition never triggered")
    assert(app.load(node(d2)).collect().head.getDouble(1) == 5.0)
  }

  test("pending set discovered while PAUSED survives a driver crash") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/stream_paused_src"
    val day = "2026-08-12"
    Seq((day, 1.0), (day, 2.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$day")
    val marker = new java.io.File(s"$srcRoot/$day/_SUCCESS")
    assert(marker.delete()) // data files land before the marker

    val app = new Application("stream_paused", spark, s"$work/app_stream_paused")
    val src = app.marshalExternalData("src", srcRoot, daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()
    app.pause()

    // the paused stream discovers the unmarked dir; the binaryFile source
    // then commits its offsets — so the dir must already be durable
    val ckpt = s"$work/ckpt_paused"
    new MarkerStream(app, Seq(srcRoot), ckpt).start().awaitTermination(60000)

    // driver "crashes" while paused: a NEW MarkerStream on the same
    // checkpoint will never re-see the committed part rows — only the
    // persisted pending set can carry the completion over
    val ms2 = new MarkerStream(app, Seq(srcRoot), ckpt)
    app.resume()
    assert(marker.createNewFile())
    ms2.recheckPending()
    assert(app.poll(node(day)).isDefined,
      "pending dir discovered while paused was lost across the restart")
    assert(app.load(node(day)).collect().head.getDouble(1) == 3.0)
  }

  test("pending file crash window between delete and rename falls back to tmp") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/stream_tmpfb_src"
    val day = "2026-08-12"
    Seq((day, 4.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$day")

    val app = new Application("stream_tmpfb", spark, s"$work/app_stream_tmpfb")
    val src = app.marshalExternalData("src", srcRoot, daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    app.activate()

    // simulate savePending dying between delete(old) and rename(tmp):
    // only the tmp file exists, holding the complete set
    val ckpt = new java.io.File(s"$work/ckpt_tmpfb")
    assert(ckpt.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ckpt.getPath, "_graft_pending_dirs.tmp"),
      s"file:$srcRoot/$day\n".getBytes("UTF-8"))

    val ms = new MarkerStream(app, Seq(srcRoot), ckpt.getPath)
    ms.recheckPending()
    assert(app.poll(node(day)).isDefined,
      "tmp-only pending file (mid-swap crash) must still be recovered")
  }

  test("windowed streaming metric aggregation with watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, Double, Timestamp)]
    val stats = StreamingMetrics.windowedStats(
      mem.toDF().toDF("name", "value", "time"),
      "name", "value", "time", windowSecs = 60, watermarkSecs = 30)
    val q = stats.writeStream.format("memory").queryName("win_stats")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(("err", 1.0, t("2026-01-01 00:00:10")),
      ("err", 2.0, t("2026-01-01 00:00:50")))
    q.processAllAvailable()
    // advance the watermark far past the first window to close it
    mem.addData(("err", 9.0, t("2026-01-01 00:10:00")))
    q.processAllAvailable()
    mem.addData(("err", 1.0, t("2026-01-01 00:20:00")))
    q.processAllAvailable()
    val rows = spark.table("win_stats").orderBy("period_start").collect()
    q.stop()
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getAs[Double]("sum") == 3.0)
    assert(first.getAs[Long]("sample_count") == 2L)
  }

  test("streaming sessionization: gaps split sessions, watermark closes them") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, Double, Timestamp)]
    val sess = StreamingMetrics.sessionStats(
      mem.toDF().toDF("user", "value", "time"),
      "user", "value", "time", gapSecs = 60, watermarkSecs = 30)
    val q = sess.writeStream.format("memory").queryName("sess_stats")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: two events 40s apart (one session), then a 5-min silence,
    // then a second session; user 2: one singleton session
    mem.addData((1L, 1.0, t("2026-01-01 00:00:10")),
      (1L, 2.0, t("2026-01-01 00:00:50")),
      (2L, 7.0, t("2026-01-01 00:00:20")))
    q.processAllAvailable()
    mem.addData((1L, 5.0, t("2026-01-01 00:06:00")))
    q.processAllAvailable()
    // advance the watermark far enough to close every session
    mem.addData((1L, 0.0, t("2026-01-01 01:00:00")))
    q.processAllAvailable()
    val rows = spark.table("sess_stats")
      .orderBy("key", "session_start").collect()
    q.stop()
    val u1 = rows.filter(_.getAs[Long]("key") == 1L)
    assert(u1.length >= 2, s"user 1 must have 2 closed sessions: ${rows.toSeq}")
    assert(u1.head.getAs[Long]("n_events") == 2L &&
      u1.head.getAs[Double]("total_value") == 3.0,
      "the 40s-gap events merge into one session")
    assert(u1(1).getAs[Long]("n_events") == 1L &&
      u1(1).getAs[Double]("total_value") == 5.0,
      "the 5-minute silence splits the second session")
    val u2 = rows.filter(_.getAs[Long]("key") == 2L)
    assert(u2.length == 1 && u2.head.getAs[Long]("n_events") == 1L)
  }

  test("composed long-lived driver: markers, timer, alarm, and sweeper together") {
    val sp = spark
    import sp.implicits._
    val srcRoot = s"$work/driver_src"
    val day = "2026-08-12"
    Seq((day, 2.0), (day, 4.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$srcRoot/$day")

    val app = new Application("driver", spark, s"$work/app_driver")
    val src = app.marshalExternalData("src", srcRoot, daySpec)
    // marker-driven node: triggers when the _SUCCESS event streams in
    val marked = app.createData("marked", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    // rate-timer node: anchored so the first tick lands ~1s from now
    val timer = app.createTimer("fast_tick", format = "%Y-%m-%d %H:%M",
      dimName = "t", scheduleExpression = "rate(1 minutes)")
    val ticked = app.createData("ticked", Seq(timer, src.latest(1).ref),
      Seq(SqlSlot("SELECT CAST(COUNT(*) AS BIGINT) AS rows FROM src")),
      outputLinks = List(graft.signal.DimensionLink.literal(
        graft.signal.DimRef("src", "day"), day)))
    // alarm node: fires when the platform metrics show `marked` succeeded
    val alarm = app.createMetricAlarm("marked_ok",
      () => app.platformMetricsDf().where(col("name") === "route.marked.execSucceeded"),
      graft.diagnostics.AlarmParams(1.0,
        graft.diagnostics.AlarmComparison.GreaterThanOrEqualToThreshold, 1, 1),
      periodSecs = 60, timeFormat = "%Y-%m-%d %H")
    val onAlarm = app.createData("on_alarm", Seq(alarm("ALARM", "*")),
      Seq(SqlSlot("SELECT 'alarmed' AS what")))
    app.activate()

    val scheduler = app.scheduler(startAt =
      java.time.Instant.now().minusSeconds(59))
    val monitor = app.alarmMonitor()
    val stream = new MarkerStream(app, Seq(srcRoot), s"$work/ckpt_driver")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = stream.start(
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("300 milliseconds"))
      scheduler.start(pollMillis = 200)
      monitor.start(pollMillis = 300)
      app.startSweeper(pollMillis = 300)
      val deadline = System.currentTimeMillis() + 90000
      def done =
        app.poll(marked(day)).isDefined &&
          app.pendingNodeCounts.getOrElse("ticked", 0) == 0 &&
          app.computeRecords.exists(r => r.routeId == "ticked" && r.succeeded) &&
          app.computeRecords.exists(r => r.routeId == "on_alarm" && r.succeeded)
      while (!done && System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(app.poll(marked(day)).isDefined, "marker-driven node never ran")
      assert(app.load(marked(day)).collect().head.getDouble(1) == 6.0)
      assert(app.computeRecords.exists(r => r.routeId == "ticked" && r.succeeded),
        "rate-timer node never fired through the scheduler poller")
      assert(app.computeRecords.exists(r => r.routeId == "on_alarm" && r.succeeded),
        "metric alarm never triggered its node through the monitor poller")
    } finally {
      app.stopSweeper(); monitor.stop(); scheduler.stop()
      if (q != null) scala.util.Try(q.stop())
    }
  }

  test("text-analysis Column ops run unchanged inside Structured Streaming") {
    // the payoff of the no-UDF design: tokens/quality/langId/simhash are
    // pure Catalyst expressions, so the SAME operators run on a stream
    // with no code changes and produce batch-identical values
    val sp = spark
    import sp.implicits._
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "der schnelle braune fuchs springt und die hunde laufen weg"))
    def analyzed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("tokens"),
        round(TextFunctions.qualityScore(col("text")), 6).as("quality"),
        TextFunctions.langId(col("text")).as("lang"),
        TextFunctions.simhash64(col("text")).as("sh"))
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = analyzed(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("txt_stream")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM txt_stream ORDER BY doc_id")
        .collect().map(_.toSeq).toSeq
      val batch = analyzed(docs.toDF("doc_id", "text")).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, "stream/batch divergence in text ops")
      assert(streamed.map(_.apply(3)) == Seq("en", "de"))
    } finally q.stop()
  }

  test("streaming ingest dedup drops re-ingested duplicate content") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val deduped = StreamingDedup.dropDuplicateContent(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(
      (1L, "alpha beta gamma", t("2026-01-01 00:00:01")),
      (2L, "delta epsilon zeta", t("2026-01-01 00:00:02")))
    q.processAllAvailable()
    // re-ingest doc 1's content under a new id within the watermark
    mem.addData((3L, "alpha beta gamma", t("2026-01-01 00:01:00")),
      (4L, "fresh content entirely", t("2026-01-01 00:01:30")))
    q.processAllAvailable()
    val ids = spark.table("sdedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids == Set(1L, 2L, 4L)) // the duplicate (id 3) was dropped
  }

  test("streaming near-dup ingest probes and maintains the durable index") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val long =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val other =
      "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val corpus = Seq((1L, long),
      (2L, "completely different corpus content about catalyst codegen"))
      .toDF("doc_id", "text")
    val ixPath = s"$work/stream_ndix"
    graft.operators.Dedup.saveNearDupIndex(
      graft.operators.Dedup.buildNearDupIndex(corpus, "text", "doc_id",
        k = 64, bands = 16, shingleN = 2, persist = false), ixPath)
    val pairsOut = s"$work/stream_ndpairs"
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupIngest(mem.toDF().toDF("doc_id", "text"),
        ixPath, "text", pairsOut)
      .option("checkpointLocation", s"$work/stream_ndckpt").start()
    // batch 1: a near-dup of corpus doc 1 + a fresh doc
    mem.addData((10L, long + " extra"), (11L, other))
    q.processAllAvailable()
    // batch 2: a near-dup of BATCH 1's fresh doc — only flagged if the
    // index was folded forward between batches
    mem.addData((20L, other + " tail"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.read.parquet(pairsOut)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (20L, 11L)),
      s"streamed near-dup pairs wrong: $pairs")
  }

  test("streaming ingest on a VERSIONED (rename-free) index folds forward (r15)") {
    // the object-store shape: the bucket table commits by pointer PUT,
    // auto-detected — the ingest loop needs no changes, and the
    // cross-batch fold (batch 2 matching batch 1's doc) proves the
    // pointer advanced between micro-batches
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val long =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val other =
      "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val corpus = Seq((1L, long),
      (2L, "completely different corpus content about catalyst codegen"))
      .toDF("doc_id", "text")
    val ixPath = s"$work/stream_ndix_v"
    graft.operators.Dedup.saveNearDupIndex(
      graft.operators.Dedup.buildNearDupIndex(corpus, "text", "doc_id",
        k = 64, bands = 16, shingleN = 2, persist = false), ixPath,
      renameFree = true)
    val pairsOut = s"$work/stream_ndpairs_v"
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupIngest(mem.toDF().toDF("doc_id", "text"),
        ixPath, "text", pairsOut)
      .option("checkpointLocation", s"$work/stream_ndckpt_v").start()
    mem.addData((10L, long + " extra"), (11L, other))
    q.processAllAvailable()
    mem.addData((20L, other + " tail"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.read.parquet(pairsOut)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (20L, 11L)),
      s"streamed near-dup pairs wrong on the versioned layout: $pairs")
    // two micro-batches advanced the pointer twice: v1 -> v3
    val names = new java.io.File(ixPath).listFiles().map(_.getName).toSet
    assert(names.contains("buckets_ptr.v3"), s"pointer did not advance: $names")
    assert(!names.contains("buckets"), "no legacy dir may appear")
  }

  test("null-text rows are not content duplicates of each other") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2026-08-14 00:00:00")
    val out = StreamingDedup.dropDuplicateContent(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("nulldup")
      .outputMode("append").start()
    mem.addData((1L, "same content", t0), (2L, null, t0),
      (3L, null, t0), (4L, "same content", t0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("nulldup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // the real duplicate collapses; BOTH null-text docs survive
    assert(ids.intersect(Set(1L, 4L)).size == 1, s"content dup kept twice: $ids")
    assert(ids.contains(2L) && ids.contains(3L),
      s"distinct null-text docs were merged as duplicates: $ids")
  }

  test("ingestId namespaces applied markers across checkpoints") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val corpus = Seq((1L, "completely different corpus content about codegen"))
      .toDF("doc_id", "text")
    val ixPath = s"$work/stream_nsix"
    graft.operators.Dedup.saveNearDupIndex(
      graft.operators.Dedup.buildNearDupIndex(corpus, "text", "doc_id",
        k = 64, bands = 16, shingleN = 2, persist = false), ixPath)
    def runOnce(ckpt: String, ingestId: String, rows: (Long, String)*): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedup.nearDupIngest(mem.toDF().toDF("doc_id", "text"),
          ixPath, "text", s"$work/stream_nspairs", ingestId = ingestId)
        .option("checkpointLocation", s"$work/$ckpt").start()
      mem.addData(rows: _*)
      q.processAllAvailable(); q.stop()
    }
    val freshText = "one two three four five six seven eight nine ten"
    runOnce("ns_ckpt_a", "streamA", (10L, freshText))
    // a SECOND stream with a fresh checkpoint restarts batch ids at 0 —
    // with a distinct ingestId its batch 0 must still fold (before the
    // namespace, streamA's batch-0 marker silently skipped it)
    runOnce("ns_ckpt_b", "streamB", (20L, freshText + " tail"))
    val sigIds = spark.read.parquet(s"$ixPath/sigs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigIds.contains(10L) && sigIds.contains(20L),
      s"fresh-checkpoint batch was skipped by a stale marker: $sigIds")
    // and the cross-stream near-dup was flagged (20 vs 10 via the index)
    val pairs = spark.read.parquet(s"$work/stream_nspairs")
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((20L, 10L)), s"cross-stream fold lost: $pairs")
  }

  test("tryProcessPath keeps completions pending while paused") {
    val sp = spark
    import sp.implicits._
    Seq((1L, 2.0), (2L, 4.0)).toDF("id", "amount")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$work/src_paused2/2026-08-12")
    val app = new Application("paused2", sp, s"$work/app_paused2")
    val src = app.marshalExternalData("src", s"$work/src_paused2", daySpec)
    app.createData("daily", Seq(src.latest(1)), Seq(graft.compute.SqlSlot(
      "SELECT COUNT(*) AS n FROM src")))
    app.activate()
    app.pause()
    assert(app.tryProcessPath(s"$work/src_paused2/2026-08-12").isEmpty,
      "paused delivery must be distinguishable from 'no route matched'")
    app.resume()
    assert(app.tryProcessPath(s"$work/src_paused2/2026-08-12").nonEmpty)
  }

  test("near-dup ingest survives a crash-replay restart idempotently") {
    val sp = spark
    import sp.implicits._
    val long =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val other =
      "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val corpus = Seq((1L, long),
      (2L, "completely different corpus content about catalyst codegen"))
      .toDF("doc_id", "text")
    val root = s"$work/stream_restart"
    val ixPath = s"$root/index"
    graft.operators.Dedup.saveNearDupIndex(
      graft.operators.Dedup.buildNearDupIndex(corpus, "text", "doc_id",
        k = 64, bands = 16, shingleN = 2, persist = false), ixPath)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    val incoming = s"$root/incoming"
    fs.mkdirs(new org.apache.hadoop.fs.Path(incoming))
    def stageFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = s"$root/tmp"
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmp/part-*")).head.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$incoming/$name"))
    }
    stageFile("b0.parquet", Seq((10L, long + " extra"), (11L, other)))
    stageFile("b1.parquet", Seq((20L, other + " tail")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def drain(): Unit = {
      val q = StreamingDedup.nearDupIngest(
          sp.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(incoming),
          ixPath, "text", s"$root/pairs")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    def pairSet() = spark.read.parquet(s"$root/pairs")
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = Set((10L, 1L), (20L, 11L))
    assert(pairSet() == expect)
    // crash replay: drop the last batch's COMMIT marker so the restart
    // re-offers that batch to foreachBatch — the applied/<batchId>
    // marker must skip the fold (no duplicate pairs, no re-appended
    // index rows)
    val commits = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/ckpt/commits"))
      .map(_.getPath).filter(!_.getName.startsWith("."))
    val last = commits.map(_.getName.toInt).max
    val sigRowsBefore = spark.read.parquet(s"$ixPath/sigs").count()
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/ckpt/commits/$last"), false)
    drain()
    assert(pairSet() == expect, "replayed batch re-flagged pairs")
    val raw = spark.read.parquet(s"$root/pairs").count()
    assert(raw == expect.size, s"replay appended duplicate pair rows: $raw")
    assert(spark.read.parquet(s"$ixPath/sigs").count() == sigRowsBefore,
      "replayed fold re-appended index rows despite its applied marker")
    // the restarted session keeps folding forward: a near-dup of the
    // replay-era doc is still flagged against the maintained index
    stageFile("b2.parquet", Seq((30L, other + " tail more")))
    drain()
    assert(pairSet().contains((30L, 20L)) || pairSet().contains((30L, 11L)),
      s"post-restart fold lost continuity: ${pairSet()}")
  }

  test("coincidence trigger fires once when all required inputs arrive") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[ArrivalEvent]
    val out = Coincidence.trigger(mem.toDS(), Set("a", "b"))
    val q = out.writeStream.format("memory").queryName("coincide")
      .outputMode("append").start()
    mem.addData(ArrivalEvent("2026-08-12", "a"))
    q.processAllAvailable()
    assert(spark.table("coincide").count() == 0) // b not yet arrived
    mem.addData(ArrivalEvent("2026-08-11", "a"),
      ArrivalEvent("2026-08-12", "b"))
    q.processAllAvailable()
    val fired = spark.table("coincide").as[CoincidenceTrigger].collect()
    assert(fired.length == 1 && fired.head.key == "2026-08-12")
    assert(fired.head.inputs == Seq("a", "b"))
    // duplicate arrival does not re-fire
    mem.addData(ArrivalEvent("2026-08-12", "b"))
    q.processAllAvailable()
    assert(spark.table("coincide").count() == 1)
    // an at-least-once upstream re-delivering the WHOLE required set must
    // not re-fire either: the fired key keeps a tombstone (pre-tombstone,
    // remove() forgot the firing and the re-completed set fired AGAIN)
    mem.addData(ArrivalEvent("2026-08-12", "a"),
      ArrivalEvent("2026-08-12", "b"))
    q.processAllAvailable()
    assert(spark.table("coincide").count() == 1,
      "re-delivered required set re-fired a tombstoned key")
    q.stop()
  }

  test("a throwing link mapper is contained: node zombied, ingestion lives") {
    import graft.routing._
    import graft.signal._
    import graft.dimension._
    val daySpec = DimSpec.pretty(
      "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
    val a = Signal("a", SignalSource.external("/tmp/ml_a"), daySpec,
      DimFilter.allPassFor(daySpec))
    val b = Signal("b", SignalSource.external("/tmp/ml_b"), daySpec,
      DimFilter.allPassFor(daySpec))
    val boom: DimValue => DimValue = _ => sys.error("mapper boom")
    val node = SignalLinkNode(List(a, b), List(
      DimensionLink(DimRef("b", "day"),
        LinkSource.FromDim(DimRef("a", "day")), boom)))
    val out = Signal("out", SignalSource.internal("/tmp/ml_out", "out"),
      daySpec, DimFilter.allPassFor(daySpec))
    val table = new RoutingTable(new PathProbe {
      def exists(p: String) = true
      override def isComplete(p: String, proto: IntegrityProtocol) = true
    })
    table.add(new Route("r1", node, out, Nil))
    // first event opens the pending node; the second offer crosses the
    // throwing link mapper — uncontained, this throw killed the event
    // loop AND re-threw from WAL replay on every restart
    val c1 = table.receivePath("/tmp/ml_a/2026-08-12")
    val c2 = table.receivePath("/tmp/ml_b/2026-08-12") // must NOT throw
    assert(c1.isEmpty && c2.isEmpty)
    // the mis-linked node was zombied and reaped — ingestion continues
    assert(table.all.head.pendingNodes.isEmpty ||
      table.all.head.pendingNodes.forall(!_.isZombie))
  }
}
