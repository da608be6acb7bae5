package graft.compute

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.dimension._
import graft.signal._

/** r13: managed-write file-size governance + APPEND compaction. The
  * 100-TB failure mode under test: a wide upstream shuffle (or a
  * long-lived APPEND partition) spraying thousands of small files. */
class CompactionSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  private def sig(root: String, attrs: DatasetAttrs): Signal =
    Signal("n1", SignalSource.internal(root, "n1").copy(attrs = attrs),
      daySpec, DimFilter.branchOf(daySpec, Seq("2026-08-10")))

  private def partFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().toSeq.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("targetFileBytes bounds part-file count from a 1200-partition write") {
    val root = tmp("graft_gov1")
    val df = spark.range(20000).toDF("id").repartition(1200)
    // ungoverned: one file per upstream task
    val plain = sig(root, DatasetAttrs())
    OutputWriter.write(spark, df, plain)
    val dir = s"$root/internal_data/n1/2026-08-10"
    assert(partFiles(dir).size > 400,
      s"ungoverned wide write should spray files, got ${partFiles(dir).size}")
    // governed: file count derives from data volume (~160 KB here)
    val root2 = tmp("graft_gov2")
    val gov = sig(root2, DatasetAttrs(targetFileBytes = Some(1L << 20)))
    OutputWriter.write(spark, df, gov)
    val dir2 = s"$root2/internal_data/n1/2026-08-10"
    val n = partFiles(dir2).size
    assert(n <= 4, s"governed write must be bounded by size, got $n files")
    assert(new java.io.File(dir2, "_SUCCESS").exists())
    assert(new java.io.File(dir2, "_SCHEMA.spark.json").exists())
    // same rows either way
    assert(spark.read.parquet(dir2).count() == 20000L)
  }

  test("maxRecordsPerFile rolls files within a task (skew backstop)") {
    val root = tmp("graft_gov3")
    val s = sig(root, DatasetAttrs(maxRecordsPerFile = Some(500L)))
    OutputWriter.write(spark, spark.range(10000).coalesce(1).toDF("id"), s)
    val dir = s"$root/internal_data/n1/2026-08-10"
    assert(partFiles(dir).size >= 20)
    val worst = spark.read.parquet(dir)
      .groupBy(input_file_name()).count()
      .agg(max("count")).collect().head.getLong(0)
    assert(worst <= 500L, s"a file exceeds the record cap: $worst")
  }

  test("governed write clusters hive-partition keys") {
    val root = tmp("graft_gov4")
    val s = sig(root, DatasetAttrs(partitionKeys = Seq("k"),
      targetFileBytes = Some(1L << 20)))
    val df = spark.range(8000).toDF("id")
      .withColumn("k", (col("id") % 4).cast("string")).repartition(311)
    OutputWriter.write(spark, df, s)
    val dir = s"$root/internal_data/n1/2026-08-10"
    (0 until 4).foreach { k =>
      val files = partFiles(s"$dir/k=$k")
      assert(files.nonEmpty && files.size <= 4,
        s"k=$k has ${files.size} files — keys must not be sliver-sprayed " +
          "across every task")
    }
  }

  private def appendBatches(s: Signal, batches: Int, wide: Int): Unit =
    (0 until batches).foreach { b =>
      OutputWriter.write(spark,
        spark.range(b * 1000L, b * 1000L + 1000L).toDF("id")
          .repartition(wide), s)
    }

  test("compactPartition rewrites an accumulated APPEND partition") {
    val root = tmp("graft_cmp1")
    val s = sig(root, DatasetAttrs(datasetType = DatasetType.APPEND))
    appendBatches(s, batches = 3, wide = 40)
    val dir = s"$root/internal_data/n1/2026-08-10"
    val before = partFiles(dir).size
    assert(before >= 100, s"append accumulation expected, got $before")
    val stats = Compaction.compactPartition(spark, s, 64L << 20)
    assert(!stats.skipped && stats.filesBefore == before)
    val after = partFiles(dir)
    assert(after.size == stats.filesAfter && after.size <= 2,
      s"expected ~1 compacted file, got ${after.size}")
    assert(new java.io.File(dir, "_SUCCESS").exists())
    val rows = spark.read.parquet(dir).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(rows.toSeq == (0L until 3000L).toSeq)
    // already compact -> no-op
    assert(Compaction.compactPartition(spark, s, 64L << 20).skipped)
  }

  test("compaction merges evolved schemas — no column silently dropped") {
    // APPEND batches are path-based (no schema check) and re-stamp the
    // schema marker per batch, so a partition can hold files with
    // different schemas. The rewrite must take the UNION schema: a
    // single arbitrary footer would drop the other files' columns with
    // matching row counts — silent data loss.
    val root = tmp("graft_cmp_sch")
    val s = sig(root, DatasetAttrs(datasetType = DatasetType.APPEND))
    OutputWriter.write(spark,
      spark.range(0L, 100L).toDF("id").repartition(20), s)
    OutputWriter.write(spark,
      spark.range(100L, 200L).toDF("id")
        .withColumn("extra", col("id") * 2).repartition(20), s)
    val dir = s"$root/internal_data/n1/2026-08-10"
    val stats = Compaction.compactPartition(spark, s, 64L << 20)
    assert(!stats.skipped)
    val out = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(out.columns.toSet == Set("id", "extra"),
      s"union schema lost: ${out.columns.mkString(",")}")
    assert(out.count() == 200L)
    // batch-2 rows keep their extra values; batch-1 rows read NULL
    assert(out.where(col("extra").isNotNull).count() == 100L)
    assert(out.where(col("id") === 150L).select("extra").head().getLong(0) == 300L)
  }

  test("governed write keeps upstream partitioning when plan stats are the sentinel") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // an RDD-backed DataFrame (LogicalRDD) has no stats — sizeInBytes
    // reads the defaultSizeInBytes sentinel; clamping to 65536
    // partitions would make the governed write strictly worse than the
    // ungoverned one
    val rdd = spark.sparkContext.parallelize(
      (0L until 100L).map(Row(_)), 3)
    val df = spark.createDataFrame(rdd,
      StructType(Seq(StructField("id", LongType))))
    assert(OutputWriter.governedFileCount(spark, df, 1L << 20).isEmpty,
      "sentinel stats must disable the governed repartition")
    val root = tmp("graft_gov_sent")
    val gov = sig(root, DatasetAttrs(targetFileBytes = Some(1L << 20)))
    OutputWriter.write(spark, df, gov)
    val dir = s"$root/internal_data/n1/2026-08-10"
    val n = partFiles(dir).size
    assert(n <= 3, s"expected upstream partitioning (3), got $n files")
    assert(spark.read.parquet(dir).count() == 100L)
  }

  test("SqlSlot.interpolate refuses metacharacter dim values; split precedes interpolation") {
    // a partition segment is data-driven — refusing quotes/';'/comments
    // closes the within-statement injection cases
    val bad = Seq("x'; DROP TABLE t; --", "a\"b", "c;d", "e--f", "g/*h", "i\\j")
    bad.foreach { v =>
      val e = intercept[IllegalArgumentException](
        SqlSlot.interpolate("SELECT * FROM t WHERE d = '{day}'", Map("day" -> v)))
      assert(e.getMessage.contains("metacharacters"), e.getMessage)
    }
    assert(SqlSlot.interpolate("SELECT '{day}'", Map("day" -> "2026-08-14"))
      == "SELECT '2026-08-14'")
    // split-then-interpolate: a ';' in a value can never mint a statement
    // (the guard refuses it outright, but the ordering is belt-and-braces:
    // statements() sees only the template)
    assert(SqlSlot.statements("SELECT 1; SELECT '{x}'").length == 2)
  }

  test("FsProbe: a dataFolder holding only _temporary is NOT complete") {
    val probe = new FsProbe(spark)
    val root = tmp("graft_probe_df")
    val part = new java.io.File(s"$root/p/2026-08-10")
    val dataTmp = new java.io.File(part, "data/_temporary/0")
    assert(dataTmp.mkdirs())
    // mid-write: the visible 'data' dir exists but holds only committer
    // scaffolding — counting the folder itself completed the partition
    // mid-job (and the caching probe memoized it forever)
    assert(!probe.isComplete(part.toString,
      graft.signal.IntegrityProtocol.None_))
    // a real file under the dataFolder completes it
    val f = new java.io.File(part, "data/part-00000.parquet")
    java.nio.file.Files.write(f.toPath, Array[Byte](1))
    assert(probe.isComplete(part.toString,
      graft.signal.IntegrityProtocol.None_))
    // zero-row marker-only dataFolder also completes (committer _SUCCESS)
    val part2 = new java.io.File(s"$root/p/2026-08-11")
    assert(new java.io.File(part2, "data").mkdirs())
    java.nio.file.Files.write(
      new java.io.File(part2, "data/_SUCCESS").toPath, Array.emptyByteArray)
    assert(probe.isComplete(part2.toString,
      graft.signal.IntegrityProtocol.None_))
  }

  test("crash at every swap step heals with zero data loss") {
    for (fp <- Seq("rewritten", "manifest-written", "success-removed",
      "old-moved", "new-moved", "committed")) {
      val root = tmp(s"graft_cmp_fp")
      val s = sig(root, DatasetAttrs(datasetType = DatasetType.APPEND))
      appendBatches(s, batches = 2, wide = 25)
      val dir = s"$root/internal_data/n1/2026-08-10"
      val boom = intercept[RuntimeException] {
        Compaction.compactPartition(spark, s, 64L << 20,
          failpoint = l => if (l == fp) sys.error(s"boom at $l"))
      }
      assert(boom.getMessage.contains(fp))
      // recovery: the next compaction heals the interrupted swap first,
      // then completes; no rows lost at ANY crash point
      val stats = Compaction.compactPartition(spark, s, 64L << 20)
      assert(stats.filesAfter <= 2, s"[$fp] not compacted: $stats")
      assert(new java.io.File(dir, "_SUCCESS").exists(), s"[$fp] no marker")
      val rows = spark.read.parquet(dir).select("id").collect()
        .map(_.getLong(0)).sorted
      assert(rows.toSeq == (0L until 2000L).toSeq, s"[$fp] data diverged")
      assert(partFiles(dir).forall(f => !f.getName.startsWith(".")))
      assert(!new java.io.File(dir, ".compact-old").exists(), s"[$fp] old dir")
      assert(!new java.io.File(dir, ".compact-tmp").exists(), s"[$fp] tmp dir")
      assert(!new java.io.File(dir, ".compact-manifest").exists(),
        s"[$fp] manifest")
    }
  }

  test("healPartition alone restores the committed state (no recompact)") {
    val root = tmp("graft_cmp_heal")
    val s = sig(root, DatasetAttrs(datasetType = DatasetType.APPEND))
    appendBatches(s, batches = 2, wide = 10)
    val dir = s"$root/internal_data/n1/2026-08-10"
    val before = partFiles(dir).map(_.getName).toSet
    intercept[RuntimeException] {
      Compaction.compactPartition(spark, s, 64L << 20,
        failpoint = l => if (l == "new-moved") sys.error("boom"))
    }
    assert(Compaction.healPartition(spark, s))
    assert(partFiles(dir).map(_.getName).toSet == before,
      "heal must restore exactly the pre-compaction committed files")
    assert(new java.io.File(dir, "_SUCCESS").exists())
    assert(!Compaction.healPartition(spark, s), "idempotent no-op")
  }
}
