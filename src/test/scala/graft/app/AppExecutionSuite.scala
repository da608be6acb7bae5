package graft.app

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import scala.concurrent.Await
import scala.concurrent.duration._
import graft.compute.SqlSlot
import graft.dimension.{DimSpec, DimType}

/** B1 dependency-tree propagation + E4 async execution + format surface
  * (orc/json managed outputs). */
class AppExecutionSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _
  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  override def beforeAll(): Unit = {
    work = Files.createTempDirectory("graft_exec_test").toString
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark
    import sp.implicits._
    Seq(("2026-08-12", 1.0), ("2026-08-12", 2.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/src/2026-08-12")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def buildChain(name: String, fmt: String = "parquet")
      : (Application, NodeRef, NodeRef) = {
    val app = new Application(name, spark, s"$work/app_$name")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val s1 = app.createData("s1", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")),
      attrs = graft.signal.DatasetAttrs(format = fmt))
    val s2 = app.createData("s2", Seq(s1), Seq(SqlSlot(
      "SELECT day, total * 10 AS scaled FROM s1")))
    app.activate()
    (app, s1, s2)
  }

  test("executeWithDependents re-runs downstream nodes (B1 full)") {
    val (app, s1, s2) = buildChain("deps")
    val completed = app.executeWithDependents(s1("2026-08-12"))
    assert(completed.length == 2)
    assert(app.poll(s2("2026-08-12")).isDefined)
    assert(app.load(s2("2026-08-12")).collect().head.getDouble(1) == 30.0)
  }

  test("executeAsync returns a pollable session future (E4)") {
    val (app, s1, _) = buildChain("async")
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = app.executeAsync(s1("2026-08-12"))
    val path = Await.result(fut, 120.seconds)
    assert(path.endsWith("2026-08-12"))
    assert(app.poll(s1("2026-08-12")).contains(path))
  }

  test("managed outputs round-trip through orc and json formats (S1/S6)") {
    Seq("orc", "json").foreach { fmt =>
      val (app, s1, s2) = buildChain(s"fmt_$fmt", fmt)
      app.executeWithDependents(s1("2026-08-12"))
      // s1 written as fmt; s2 read it back through InputLoader as fmt
      assert(app.load(s2("2026-08-12")).collect().head
        .getAs[Double]("scaled") == 30.0)
    }
  }

  test("sharded multi-driver: real DAG split, cross-shard feed-back, kill-one failover") {
    // route ids pinned to opposite shards of a 2-shard ring (same
    // consistent hash every driver computes)
    val upId = (0 to 99).map(i => s"ms_up_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 0).get
    val downId = (0 to 99).map(i => s"ms_down_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 1).get
    val root = s"$work/app_msd"
    var now = 0L
    val clock = () => now
    @volatile var failUpstream = false
    // every driver declares the SAME dev context; only shard ownership
    // differs at runtime
    def mkDriver(): Application = {
      val app = new Application("msd", spark, root)
      val src = app.marshalExternalData("src", s"$work/src", daySpec)
      val up = app.createData(upId, Seq(src.latest(1)),
        Seq(graft.compute.ScalaSlot { c =>
          if (failUpstream)
            throw new RuntimeException("injected upstream failure")
          c.input("src").groupBy("day").agg(
            org.apache.spark.sql.functions.sum("amount")
              .cast("double").as("total"))
        }))
      app.createData(downId, Seq(up), Seq(SqlSlot(
        s"SELECT day, total * 10 AS scaled FROM $upId")))
      app
    }
    val dA = mkDriver(); val dB = mkDriver()
    dA.activateSharded("A", 2, shards = Some(Set(0)),
      leaseTimeoutMillis = 1000, clock = clock)
    dB.activateSharded("B", 2, leaseTimeoutMillis = 1000, clock = clock)
    assert(dA.ownedShards == Set(0) && dB.ownedShards == Set(1))

    // day 1: the event lands on A; the upstream SqlSlot executes there
    // (managed parquet + _SUCCESS); the downstream belongs to B's shard,
    // so its trigger crosses drivers through the inbox
    val cA = dA.processPath(s"$work/src/2026-08-12")
    assert(cA.exists(_.endsWith(s"$upId/2026-08-12")))
    assert(!cA.exists(_.contains(downId)))
    val cB = dB.shardedCycle()
    assert(cB.exists(_.endsWith(s"$downId/2026-08-12")))
    val down = dB.getData(downId).get
    assert(dB.load(down("2026-08-12")).collect().head.getDouble(1) == 30.0)

    // day 2: A ingests the event (WAL-logged) but dies mid-flight —
    // the execution fails before any completion
    val sp = spark; import sp.implicits._
    Seq(("2026-08-13", 5.0), ("2026-08-13", 6.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/src/2026-08-13")
    failUpstream = true
    intercept[RuntimeException](dA.processPath(s"$work/src/2026-08-13"))
    failUpstream = false
    // A stops heartbeating; past the timeout B's cycle takes over the
    // expired shard, replays its WAL, re-executes the mid-flight
    // upstream, and — owning both shards now — feeds the downstream
    // locally
    now = 2000
    val cB2 = dB.shardedCycle()
    assert(dB.ownedShards == Set(0, 1))
    assert(cB2.exists(_.endsWith(s"$upId/2026-08-13")))
    assert(cB2.exists(_.endsWith(s"$downId/2026-08-13")))
    assert(dB.load(down("2026-08-13")).collect().head.getDouble(1) == 110.0)
    // the COMPLETED day-1 execution did not re-run at takeover: its
    // _SUCCESS marker filtered it from the replay's mid-flight set
    assert(!cB2.exists(_.endsWith(s"$upId/2026-08-12")))
    // the dead driver discovers it was fenced and drops the shard
    dA.shardedCycle()
    assert(dA.ownedShards.isEmpty)
    dA.terminate(); dB.terminate()
  }

  test("redelivered completion skips the re-run when the output is fresh; " +
    "a re-published input still recomputes (r17 duplicate guard)") {
    // the 8-driver HTTP soak's failure shape: an at-least-once
    // redelivery re-ran a hop whose output had already committed, and
    // the duplicate's overwrite raced a downstream reader (which
    // committed an EMPTY result under a valid _SUCCESS)
    val upId = (0 to 99).map(i => s"dup_up_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 0).get
    val downId = (0 to 99).map(i => s"dup_dn_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 1).get
    val root = s"$work/app_dup"
    val downRuns = new java.util.concurrent.atomic.AtomicInteger
    def mkDriver(): Application = {
      val app = new Application("dup", spark, root)
      val src = app.marshalExternalData("src", s"$work/src", daySpec)
      val up = app.createData(upId, Seq(src.latest(1)), Seq(SqlSlot(
        "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
      app.createData(downId, Seq(up), Seq(graft.compute.ScalaSlot { c =>
        downRuns.incrementAndGet()
        c.input(upId).selectExpr("day", "total * 10 AS scaled")
      }))
      app
    }
    val dA = mkDriver(); val dB = mkDriver()
    dA.activateSharded("A", 2, shards = Some(Set(0)))
    dB.activateSharded("B", 2, shards = Some(Set(1)))
    dA.processPath(s"$work/src/2026-08-12")
    assert(dB.shardedCycle().exists(_.endsWith(s"$downId/2026-08-12")))
    assert(downRuns.get == 1)
    val upOut = s"$root/internal_data/$upId/2026-08-12"
    // age the input past the skew margin: the skip is provable only when
    // the output is newer by MORE than duplicateSkipSkewMs (r18), and the
    // in-cycle write gap is milliseconds
    val downOutSucc0 = new java.io.File(
      s"$root/internal_data/$downId/2026-08-12/_SUCCESS")
    assert(new java.io.File(s"$upOut/_SUCCESS")
      .setLastModified(downOutSucc0.lastModified() - 10000))
    assert(new java.io.File(upOut)
      .setLastModified(downOutSucc0.lastModified() - 10000))

    // redeliver the upstream completion into B's shard-1 inbox — the
    // crash shape (completing driver died between inbox send and its
    // delete; or a takeover refolded a surviving message)
    def redeliver(): Unit = {
      val dir = new java.io.File(s"$root/sharding/shards/shard-1/inbox")
      dir.mkdirs()
      val msg = new java.io.File(dir,
        f"msg-${System.currentTimeMillis()}%013d-test${downRuns.get}%02d")
      val w = new java.io.FileWriter(msg)
      // WalCodec.esc is identity for plain paths (no tabs/newlines)
      try w.write(s"c\t$upOut\ne\t$upOut\n")
      finally w.close()
    }
    redeliver()
    val completed = dB.shardedCycle()
    assert(downRuns.get == 1,
      "duplicate redelivery must not re-run a fresh output")
    // feedback still fired (the redelivery may exist because the
    // original completion's feedback was lost): the skip reports the
    // completed output path instead of silently swallowing it
    assert(completed.exists(_.endsWith(s"$downId/2026-08-12")))

    // a RE-PUBLISHED input (backfill/correction: newer completion stamp
    // than the output) must still recompute — freshness, not amnesia
    val downOutSucc = new java.io.File(
      s"$root/internal_data/$downId/2026-08-12/_SUCCESS")
    val upSucc = new java.io.File(s"$upOut/_SUCCESS")
    assert(upSucc.setLastModified(downOutSucc.lastModified() + 1000))
    redeliver()
    dB.shardedCycle()
    assert(downRuns.get == 2,
      "a re-published (newer) input must re-run the downstream")

    // the APPEND shape: new part files land WITHOUT touching the
    // existing _SUCCESS — only the dir mtime sees them. The input stamp
    // must be the NEWER of marker and dir, or the guard would read the
    // stale marker and skip a recompute the appended batch needs.
    val downSucc2 = new java.io.File(
      s"$root/internal_data/$downId/2026-08-12/_SUCCESS")
    assert(upSucc.setLastModified(downSucc2.lastModified() - 5000))
    val appended = new java.io.File(upOut, "part-99999-appended.parquet")
    new java.io.FileOutputStream(appended).close() // bumps DIR mtime
    assert(new java.io.File(upOut)
      .setLastModified(downSucc2.lastModified() + 2000))
    redeliver()
    dB.shardedCycle()
    assert(downRuns.get == 3,
      "appended input data (marker untouched) must re-run the downstream")

    // NESTED append (hive-style key=value subdir): only the SUBDIR's
    // mtime moves — the one-level-deep input stamp must still see it
    val downSucc3 = new java.io.File(
      s"$root/internal_data/$downId/2026-08-12/_SUCCESS")
    assert(upSucc.setLastModified(downSucc3.lastModified() - 5000))
    val sub = new java.io.File(upOut, "region=eu")
    assert(sub.mkdirs())
    assert(sub.setLastModified(downSucc3.lastModified() + 2000))
    // re-age the ROOT after mkdirs bumped it: ONLY the subdir is newer,
    // so a root-only stamp would wrongly skip — the deep stamp must see it
    assert(new java.io.File(upOut)
      .setLastModified(downSucc3.lastModified() - 5000))
    redeliver()
    dB.shardedCycle()
    assert(downRuns.get == 4,
      "nested (subdir) append must re-run the downstream")

    // SKEW MARGIN (r18): same-tick stamps (coarse-mtime stores round an
    // input and its derived output into the same second) must RUN — a
    // spurious re-run is idempotent, a spurious skip loses a recompute
    val downSucc4 = new java.io.File(
      s"$root/internal_data/$downId/2026-08-12/_SUCCESS")
    assert(new java.io.File(upOut, "region=eu")
      .setLastModified(downSucc4.lastModified() - 60000))
    assert(upSucc.setLastModified(downSucc4.lastModified()))
    assert(new java.io.File(upOut)
      .setLastModified(downSucc4.lastModified()))
    redeliver()
    dB.shardedCycle()
    assert(downRuns.get == 5, "same-tick stamps must run (tie = undecidable)")

    // within the margin (newer, but by less than duplicateSkipSkewMs):
    // still undecidable, still runs
    val downSucc5 = new java.io.File(
      s"$root/internal_data/$downId/2026-08-12/_SUCCESS")
    val withinMargin =
      downSucc5.lastModified() - dB.duplicateSkipSkewMs + 500
    assert(upSucc.setLastModified(withinMargin))
    assert(new java.io.File(upOut).setLastModified(withinMargin))
    assert(new java.io.File(upOut, "region=eu").setLastModified(withinMargin))
    redeliver()
    dB.shardedCycle()
    assert(downRuns.get == 6, "within-margin stamps must run")
    dA.terminate(); dB.terminate()
  }

  test("re-published rawContent trigger defeats the duplicate skip " +
    "(r18: trigger partitions carry stampable markers)") {
    // a rawContent (artifact/trigger) input is never loaded as a
    // DataFrame, but its completion marker IS the re-publish signal for
    // a forced recompute — excluding it from the input-stamp max made
    // the forced re-run look like a provable duplicate and skipped it
    val nodeId = (0 to 99).map(i => s"raw_dn_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 1) == 0).get
    val root = s"$work/app_rawdup"
    val modelDir = s"$work/model_rawdup/2026-08-12"
    new java.io.File(modelDir).mkdirs()
    new java.io.FileOutputStream(s"$modelDir/_SUCCESS").close()
    val runs = new java.util.concurrent.atomic.AtomicInteger
    val app = new Application("rawdup", spark, root)
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val model = app.marshalExternalModel(
      "mdl", s"$work/model_rawdup", daySpec)
    app.createData(nodeId, Seq(src.latest(1), model.latest(1)),
      Seq(graft.compute.ScalaSlot { c =>
        runs.incrementAndGet()
        c.input("src").selectExpr("day", "amount * 2 AS doubled")
      }))
    app.activateSharded("A", 1)
    app.processPath(modelDir)
    app.processPath(s"$work/src/2026-08-12")
    app.shardedCycle()
    assert(runs.get == 1)
    val outSucc = new java.io.File(
      s"$root/internal_data/$nodeId/2026-08-12/_SUCCESS")
    assert(outSucc.exists())
    // age ALL inputs (markers + dirs) past the margin -> provable dup
    def age(dir: String, to: Long): Unit = {
      assert(new java.io.File(dir, "_SUCCESS").setLastModified(to))
      assert(new java.io.File(dir).setLastModified(to))
    }
    val old = outSucc.lastModified() - 10000
    age(s"$work/src/2026-08-12", old)
    age(modelDir, old)
    def redeliver(): Unit = {
      val dir = new java.io.File(s"$root/sharding/shards/shard-0/inbox")
      dir.mkdirs()
      val msg = new java.io.File(dir,
        f"msg-${System.currentTimeMillis()}%013d-raw${runs.get}%02d")
      val w = new java.io.FileWriter(msg)
      // both inputs: the coincidence join needs both events to re-form
      // the execution context the guard then classifies
      try w.write(s"c\t${s"$work/src/2026-08-12"}\ne\t${s"$work/src/2026-08-12"}\n" +
        s"c\t$modelDir\ne\t$modelDir\n")
      finally w.close()
    }
    redeliver()
    app.shardedCycle()
    assert(runs.get == 1, "aged inputs: redelivery is a provable duplicate")
    // RE-PUBLISH the rawContent trigger (newer marker) -> must recompute
    age(modelDir, outSucc.lastModified() + 1000)
    redeliver()
    app.shardedCycle()
    assert(runs.get == 2,
      "a re-published rawContent trigger must force the recompute")
    app.terminate()
  }

  test("process(signal) forwards a materialized event to the owning driver") {
    // a SIGNAL-form event (fireTimer) ingested on the WRONG driver must
    // cross to the owning shard through the inbox, same as processPath —
    // any driver can ingest any event
    val nodeId = (0 to 99).map(i => s"tmr_node_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 1).get
    val root = s"$work/app_sigfwd"
    def mkDriver(): Application = {
      val app = new Application("sigfwd", spark, root)
      val timer = app.createTimer("tk", format = "%Y-%m-%d")
      app.createData(nodeId, Seq(timer),
        Seq(SqlSlot("SELECT '{time}' AS day")))
      app
    }
    val dA = mkDriver(); val dB = mkDriver()
    dA.activateSharded("A", 2, shards = Some(Set(0)))
    dB.activateSharded("B", 2, shards = Some(Set(1)))
    // A owns no accepting shard: nothing runs locally, the event forwards
    val local = dA.fireTimer(dA.getTimer("tk").get, "2026-08-12")
    assert(local.isEmpty)
    val done = dB.shardedCycle()
    assert(done.exists(_.endsWith(s"$nodeId/2026-08-12")),
      s"timer event did not cross drivers: $done")
    assert(dB.load(dB.getData(nodeId).get("2026-08-12")).collect()
      .map(_.getString(0)).toSeq == Seq("2026-08-12"))
    dA.terminate(); dB.terminate()
  }

  test("re-activating a sharded driver releases its previous leases") {
    def mkApp(): Application = {
      val app = new Application("reshard", spark, s"$work/app_reshard")
      val src = app.marshalExternalData("src", s"$work/src", daySpec)
      app.createData("n_reshard", Seq(src.latest(1)),
        Seq(SqlSlot("SELECT day FROM src")))
      app
    }
    val app = mkApp()
    val shard = graft.routing.Sharding.shardOf("n_reshard", 2)
    app.activateSharded("A", 2, shards = Some(Set(shard)))
    assert(app.ownedShards == Set(shard))
    // reconfigure to own NOTHING: the old incarnation's lease must be
    // RELEASED (tombstoned), not abandoned — a successor claims the
    // shard immediately instead of waiting out the lease timeout
    app.activateSharded("A", 2, shards = Some(Set.empty[Int]))
    assert(app.ownedShards.isEmpty)
    val other = mkApp()
    other.activateSharded("B", 2, shards = Some(Set(shard)))
    assert(other.ownedShards == Set(shard),
      "released shard was not immediately claimable")
    app.terminate(); other.terminate()
  }

  test("cross-process multi-driver: a forked JVM runs the downstream over the shared store") {
    // The in-process sharded test above shares one SparkSession; this one
    // forks a REAL second driver process (own JVM, own SparkSession) that
    // attaches the saved dev context, owns the downstream shard, and
    // executes its SqlSlot — the only shared medium is the filesystem,
    // which is exactly the production multi-driver contract.
    val upId = (0 to 99).map(i => s"xp_up_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 0).get
    val downId = (0 to 99).map(i => s"xp_down_$i")
      .find(id => graft.routing.Sharding.shardOf(id, 2) == 1).get
    val root = s"$work/app_xpd"
    val appA = new Application("xpd", spark, root)
    val src = appA.marshalExternalData("src", s"$work/src", daySpec)
    val up = appA.createData(upId, Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    appA.createData(downId, Seq(up), Seq(SqlSlot(
      s"SELECT day, total * 10 AS scaled FROM $upId")))
    appA.saveDevState()
    appA.activateSharded("A", 2, shards = Some(Set(0)))

    // fork driver B: same classpath and module opens as this test JVM
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments).asScala.toList.filterNot(_.startsWith("-Xmx"))
    val cmd = List(javaBin) ++ jvmArgs ++ List("-Xmx3g",
      "-cp", System.getProperty("java.class.path"),
      "graft.app.ShardedDriverMain", "xpd", root, "1", "B", "120000")
    val procB = new ProcessBuilder(cmd: _*).inheritIO().start()
    try {
      val ready = java.nio.file.Paths.get(root, "driver-ready-B")
      val bootDeadline = System.currentTimeMillis() + 120000
      while (!java.nio.file.Files.exists(ready) &&
          System.currentTimeMillis() < bootDeadline) Thread.sleep(200)
      assert(java.nio.file.Files.exists(ready), "driver B never came up")

      // the event lands on A; the upstream executes HERE; the downstream
      // completion crosses the process boundary through the inbox
      val cA = appA.processPath(s"$work/src/2026-08-12")
      assert(cA.exists(_.endsWith(s"$upId/2026-08-12")))
      assert(!cA.exists(_.contains(downId)))
      val downSuccess = new org.apache.hadoop.fs.Path(
        s"$root/internal_data/$downId/2026-08-12/_SUCCESS")
      val fs = downSuccess.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val execDeadline = System.currentTimeMillis() + 90000
      while (!fs.exists(downSuccess) &&
          System.currentTimeMillis() < execDeadline) Thread.sleep(300)
      assert(fs.exists(downSuccess),
        "driver B never completed the downstream partition")
      val out = spark.read.parquet(s"$root/internal_data/$downId/2026-08-12")
      assert(out.collect().head.getAs[Double]("scaled") == 30.0)
    } finally {
      procB.destroy()
      procB.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
      appA.terminate()
    }
  }

  test("avro round-trips through the generic format path (S1/S6)") {
    // spark-avro is an external module (built-in since 2.4 but deployed
    // separately); this container ships only avro-core, so the test cancels
    // here and runs wherever the standard connector is on the classpath.
    val avroAvailable = scala.util.Try(
      spark.range(1).write.mode("overwrite").format("avro")
        .save(s"$work/avro_probe")).isSuccess
    assume(avroAvailable, "spark-avro connector not deployed")
    val (app, s1, s2) = buildChain("fmt_avro", "avro")
    app.executeWithDependents(s1("2026-08-12"))
    assert(app.load(s2("2026-08-12")).collect().head.getAs[Double]("scaled") == 30.0)
  }

  test("persisted _SCHEMA.spark.json wins over inference for managed outputs") {
    val app = new Application("schema", spark, s"$work/app_schema")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    // a zero-padded code written as csv would re-infer as a NUMBER and lose
    // its padding — the persisted Spark schema must win over inference
    val s1 = app.createData("typed", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, '00123' AS padded_code, amount FROM src")),
      attrs = graft.signal.DatasetAttrs(format = "csv"))
    app.activate()
    app.execute(s1("2026-08-12"))
    val loaded = app.load(s1("2026-08-12"))
    assert(loaded.schema("padded_code").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(loaded.collect().head.getAs[String]("padded_code") == "00123")
  }

  test("libsvm round-trips through the generic format path (S1/S6)") {
    import org.apache.spark.ml.linalg.Vectors
    val df = spark.createDataFrame(Seq(
      (1.0, Vectors.dense(1.0, 2.0, 3.0)),
      (0.0, Vectors.sparse(3, Array(1), Array(4.0))))).toDF("label", "features")
    df.coalesce(1).write.mode("overwrite").format("libsvm")
      .save(s"$work/src_svm/2026-08-12")
    val app = new Application("svm", spark, s"$work/app_svm")
    val src = app.marshalExternalData("src", s"$work/src_svm", daySpec,
      attrs = graft.signal.DatasetAttrs(format = "libsvm"))
    val node = app.createData("svm_agg", Seq(src.latest(1)),
      Seq(graft.compute.ScalaSlot { ctx =>
        ctx.input("src").selectExpr("CAST(SUM(label) AS DOUBLE) AS label_sum")
      }))
    app.activate()
    app.execute(node("2026-08-12"))
    assert(app.load(node("2026-08-12")).collect().head.getDouble(0) == 1.0)
  }

  test("part-file event normalizes to its partition completion") {
    val (app, s1, _) = buildChain("partfile")
    // a data-FILE creation event (Spark writer part file) must trigger the
    // same route as its partition dir (reference part-00000 normalization)
    val partFile = new java.io.File(s"$work/src/2026-08-12").listFiles()
      .map(_.getName).find(_.startsWith("part-")).get
    val completed = app.processPath(s"$work/src/2026-08-12/$partFile")
    assert(completed.nonEmpty)
    assert(app.poll(s1("2026-08-12")).isDefined)
  }

  test("kill cancels an active execution; no-op without one (control surface)") {
    val app = new Application("kill", spark, s"$work/app_kill")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val started = new java.util.concurrent.CountDownLatch(1)
    val slow = app.createData("slow", Seq(src.latest(1)), Seq(graft.compute.ScalaSlot { ctx =>
      import org.apache.spark.sql.functions._
      started.countDown()
      // a genuinely long Spark job: cancel must abort its stages
      ctx.spark.range(50000000000L)
        .filter(col("id") % 1000000007L === 123).count()
      ctx.input("src")
    }))
    app.activate()
    assert(!app.kill(slow("2026-08-12"))) // nothing active yet
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = app.executeAsync(slow("2026-08-12"))
    started.await(30, java.util.concurrent.TimeUnit.SECONDS)
    Thread.sleep(500) // let the Spark job actually start
    assert(app.kill(slow("2026-08-12")))
    val failed = Await.ready(fut, 60.seconds).value.get
    assert(failed.isFailure)
    assert(app.poll(slow("2026-08-12")).isEmpty) // no completed partition
  }

  test("overlapping execution of one output fires onExecSkipped, not a second run (H1)") {
    val app = new Application("skip", spark, s"$work/app_skip")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val skipped = new java.util.concurrent.atomic.AtomicInteger(0)
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val hooks = new graft.routing.RouteHooks {
      override def onExecSkipped(r: graft.routing.Route,
                                 ctx: graft.routing.ExecutionContext): Unit =
        skipped.incrementAndGet()
    }
    val node = app.createData("slow_skip", Seq(src.latest(1)),
      Seq(graft.compute.ScalaSlot { ctx =>
        runs.incrementAndGet(); started.countDown()
        release.await(30, java.util.concurrent.TimeUnit.SECONDS)
        ctx.input("src")
      }), hooks = hooks)
    app.activate()
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = app.executeAsync(node("2026-08-12"))
    started.await(30, java.util.concurrent.TimeUnit.SECONDS)
    // event-driven trigger resolving to the SAME output partition while
    // the manual run still holds it: must be skipped, not stacked
    val completed = app.processPath(s"$work/src/2026-08-12")
    assert(completed.isEmpty)
    assert(skipped.get() == 1)
    release.countDown()
    Await.result(fut, 120.seconds)
    assert(runs.get() == 1) // the skipped context never reached the slot
    // with the execution finished, the same event executes normally
    val after = app.processPath(s"$work/src/2026-08-12")
    assert(after.nonEmpty && skipped.get() == 1)
  }

  test("racing events for one output claim atomically: exactly one run, rest skip") {
    val app = new Application("skiprace", spark, s"$work/app_skiprace")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val inSlot = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val skipped = new java.util.concurrent.atomic.AtomicInteger(0)
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val hooks = new graft.routing.RouteHooks {
      override def onExecSkipped(r: graft.routing.Route,
                                 ctx: graft.routing.ExecutionContext): Unit =
        skipped.incrementAndGet()
    }
    app.createData("race_node", Seq(src.latest(1)),
      Seq(graft.compute.ScalaSlot { ctx =>
        runs.incrementAndGet(); inSlot.countDown()
        release.await(30, java.util.concurrent.TimeUnit.SECONDS)
        ctx.input("src")
      }), hooks = hooks)
    app.activate()
    // N threads fire the same completed-source event simultaneously; the
    // check-and-claim must be one atomic step, so exactly one reaches the
    // slot no matter how the threads interleave (the pre-fix code did
    // containsKey here + merge inside the run — two racers could both
    // pass the check and stack executions)
    val n = 6
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val futs = (1 to n).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = { barrier.await(); app.processPath(s"$work/src/2026-08-12") }
      })
    }
    inSlot.await(30, java.util.concurrent.TimeUnit.SECONDS)
    // hold the runner until every other racer has resolved (skipped), so a
    // late thread can't arrive after the run finished and start a fresh one
    val deadline = System.currentTimeMillis() + 30000
    while (skipped.get() < n - 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    release.countDown()
    futs.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(runs.get() == 1, s"exactly one racer may execute, got ${runs.get()}")
    assert(skipped.get() == n - 1, s"the other ${n - 1} must skip, got ${skipped.get()}")
  }

  test("compute-record logs carry the failing SQL and exception text") {
    val app = new Application("logs", spark, s"$work/app_logs")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val bad = app.createData("bad_sql", Seq(src.latest(1)),
      Seq(SqlSlot("SELECT no_such_col FROM src")))
    val ok = app.createData("ok_log", Seq(src.latest(1)),
      Seq(graft.compute.ScalaSlot { ctx =>
        ctx.log("slot says hello"); ctx.input("src")
      }))
    app.activate()
    intercept[Exception](app.execute(bad("2026-08-12")))
    app.execute(ok("2026-08-12"))
    // the failed execution's record carries the statement + the analysis
    // error text — the reference's get_compute_record_logs debugging flow
    val failed = app.getComputeRecordLogs(bad, errorOnly = true)
    assert(failed.nonEmpty && !failed.head.succeeded)
    val lines = failed.head.logs.mkString("\n")
    assert(lines.contains("SELECT no_such_col"), s"missing sql in:\n$lines")
    assert(lines.contains("no_such_col") && lines.contains("AnalysisException"),
      s"missing exception text in:\n$lines")
    // regex filter narrows to matching lines only
    val filtered = app.getComputeRecordLogs(bad, errorOnly = true,
      filterPattern = Some("^sql>"))
    assert(filtered.head.logs.forall(_.startsWith("sql>")))
    assert(filtered.head.logs.nonEmpty)
    // errorOnly (default) hides the successful run; opting out shows its
    // slot-emitted line
    assert(app.getComputeRecordLogs(ok).isEmpty)
    val okLogs = app.getComputeRecordLogs(ok, errorOnly = false)
    assert(okLogs.exists(_.logs.contains("slot says hello")))
  }

  test("validate reports zombies and trigger-impossibility without executing") {
    val regionDaySpec = DimSpec.pretty(
      "region" -> (DimType.STRING, Map.empty[String, Any]),
      "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
    val sp = spark
    import sp.implicits._
    Seq(("2026-08-12", 1.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/src_rd/NA/2026-08-12")
    val app = new Application("validate", spark, s"$work/app_validate")
    // two aliases over one dataset: all-pass + NA-pinned (the output stays
    // open, so EU views exist dev-time — only validate can diagnose them)
    val srcAll = app.marshalExternalData("src_all", s"$work/src_rd", regionDaySpec)
    val srcNa = app.marshalExternalData("src_na", s"$work/src_rd", regionDaySpec)
    val node = app.createData("combo", Seq(srcAll, srcNa("NA", "*")), Seq(SqlSlot(
      "SELECT CAST(SUM(amount) AS DOUBLE) AS total FROM src_all")))
    app.activate()
    app.validate(node("NA", "2026-08-12")) // possible: no throw
    // EU is rejected by src_na's declared filter -> zombie diagnosis
    val e = intercept[IllegalStateException](app.validate(node("EU", "2026-08-12")))
    assert(e.getMessage.contains("zombie"))
    assert(app.poll(node("NA", "2026-08-12")).isEmpty) // validate never executes
  }

  test("ground satisfies a dangling input without a physical event") {
    val appG = new Application("ground2", spark, s"$work/app_ground2")
    val srcG = appG.marshalExternalData("src", s"$work/src", daySpec)
    val node = appG.createData("grounded", Seq(srcG.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    appG.activate()
    val completed = appG.ground(srcG("2026-08-12"))
    assert(completed.nonEmpty)
    assert(appG.load(node("2026-08-12")).collect().head.getDouble(1) == 3.0)
  }

  test("compute records track successes and failures; executeBatch runs tuples") {
    val sp = spark
    import sp.implicits._
    Seq(("2026-08-11", 4.0)).toDF("day", "amount")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/src/2026-08-11")
    val app = new Application("records", spark, s"$work/app_records")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val node = app.createData("daily", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT day, CAST(SUM(amount) AS DOUBLE) AS total FROM src GROUP BY day")))
    val bad = app.createData("broken", Seq(src.latest(1)), Seq(SqlSlot(
      "SELECT no_such_column FROM src")))
    app.activate()
    val paths = app.executeBatch(node, Seq(Seq("2026-08-11"), Seq("2026-08-12")))
    assert(paths.length == 2 && paths.forall(_.contains("daily")))
    intercept[Exception](app.execute(bad("2026-08-12")))
    val recs = app.computeRecords
    assert(recs.count(r => r.routeId == "daily" && r.succeeded) == 2)
    val failed = recs.find(_.routeId == "broken").get
    assert(!failed.succeeded && failed.error.isDefined)
    assert(app.activeComputePaths.isEmpty) // nothing in flight afterwards
  }

  test("inlined compute slot (E1): driver-side side effects, no managed write") {
    val app = new Application("inlined", spark, s"$work/app_inlined")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val seen = new java.util.concurrent.atomic.AtomicReference[Map[String, Any]]()
    val rows = new java.util.concurrent.atomic.AtomicLong(-1)
    val node = app.createData("fx", Seq(src.latest(1)), Seq(graft.compute.InlinedSlot { ctx =>
      seen.set(ctx.dimensions)
      rows.set(ctx.input("src").count())
    }))
    app.activate()
    val path = app.execute(node("2026-08-12"))
    assert(rows.get() == 2L) // the callback saw the loaded input
    assert(seen.get() == Map("day" -> "2026-08-12")) // and the output dims
    // inlined-only nodes produce no managed partition (no _SUCCESS)
    assert(app.poll(node("2026-08-12")).isEmpty)
    assert(path.endsWith("2026-08-12")) // execute still reports the target
  }

  test("event-driven process(): 2-input coincidence join at the app level") {
    val sp = spark
    import sp.implicits._
    Seq(("2026-08-12", 5.0)).toDF("day", "bonus")
      .coalesce(1).write.mode("overwrite").parquet(s"$work/src_b/2026-08-12")
    val app = new Application("events", spark, s"$work/app_events")
    val a = app.marshalExternalData("a", s"$work/src", daySpec)
    val b = app.marshalExternalData("b", s"$work/src_b", daySpec)
    val joined = app.createData("joined", Seq(a.latest(1), b.latest(1)), Seq(SqlSlot(
      """SELECT a.day, CAST(SUM(a.amount + b.bonus) AS DOUBLE) AS total
         FROM a JOIN b ON a.day = b.day GROUP BY a.day""")))
    app.activate()
    // first event: node pending (b's tip not seen yet)
    assert(app.processPath(s"$work/src/2026-08-12").isEmpty)
    // aligned second event completes the coincidence and runs the slot
    val completed = app.processPath(s"$work/src_b/2026-08-12")
    assert(completed.nonEmpty)
    // (1+5) + (2+5) = 13
    assert(app.load(joined("2026-08-12")).collect().head.getDouble(1) == 13.0)
  }

  test("8-way concurrent executeAsync: mixed slots, retry, one kill, zero leakage") {
    // r13 (VERDICT r12 #8): session isolation under real concurrency.
    // Every execution registers the SAME 'src' alias in its own isolated
    // session — cross-execution leakage would mix the multipliers.
    val app = new Application("conc", spark, s"$work/app_conc")
    val src = app.marshalExternalData("src", s"$work/src", daySpec)
    val started = new java.util.concurrent.CountDownLatch(1)
    val slow = app.createData("slow", Seq(src.latest(1)),
      Seq(graft.compute.ScalaSlot { ctx =>
        import org.apache.spark.sql.functions._
        started.countDown()
        ctx.spark.range(50000000000L)
          .filter(col("id") % 1000000007L === 123).count()
        ctx.input("src")
      }))
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val rty = app.createData("rty", Seq(src.latest(1)),
      Seq(graft.compute.ScalaSlot { ctx =>
        import org.apache.spark.sql.functions._
        if (attempts.incrementAndGet() == 1) sys.error("transient fault")
        ctx.input("src").groupBy("day")
          .agg(sum("amount").cast("double").as("total"))
      }), retry = graft.compute.RetryPolicy(maxRetries = 3, backoffMs = 10))
    val sqlNodes = (1 to 5).map(i => app.createData(s"m$i", Seq(src.latest(1)),
      Seq(SqlSlot(s"SELECT day, CAST(SUM(amount) * $i AS DOUBLE) AS total " +
        "FROM src GROUP BY day"))))
    val cls = app.createData("cls", Seq(src.latest(1)),
      Seq(graft.compute.ClassSlot("graft.app.TestTriplerSlot")))
    app.activate()
    import scala.concurrent.ExecutionContext.Implicits.global
    val slowFut = app.executeAsync(slow("2026-08-12"))
    started.await(30, java.util.concurrent.TimeUnit.SECONDS)
    val futs = (sqlNodes :+ cls :+ rty).map(n =>
      app.executeAsync(n("2026-08-12")))
    Thread.sleep(500) // the doomed Spark job is actually running
    assert(app.kill(slow("2026-08-12")))
    futs.foreach(f => Await.result(f, 300.seconds))
    assert(Await.ready(slowFut, 60.seconds).value.get.isFailure,
      "the killed execution must fail, not linger")
    // outputs: src day total = 3.0; node mI must carry EXACTLY 3*I
    (1 to 5).foreach { i =>
      val got = app.load(sqlNodes(i - 1)("2026-08-12")).collect().head.getDouble(1)
      assert(got == 3.0 * i, s"m$i read $got — cross-execution leakage")
    }
    assert(app.load(cls("2026-08-12")).collect().head.getDouble(1) == 9.0)
    assert(app.load(rty("2026-08-12")).collect().head.getDouble(1) == 3.0)
    assert(attempts.get() == 2, "retry slot must have failed once, then passed")
    assert(app.poll(slow("2026-08-12")).isEmpty, "killed output must not exist")
  }
}
