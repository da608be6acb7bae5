package graft.compute

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.dimension._
import graft.signal._

/** r17: versioned REPLACE outputs — each rewrite lands in a fresh
  * `data_v<N>/` committed by one immutable pointer PUT, so a recompute
  * can never present a half-cleared partition to a concurrent reader
  * (the remaining reader-vs-rewrite window after the duplicate-
  * redelivery guard; in-place REPLACE clears the dir first). */
class VersionedOutputSuite extends AnyFunSuite with BeforeAndAfterAll {

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

  private def sig(root: String,
                  attrs: DatasetAttrs = DatasetAttrs(versioned = true))
      : Signal =
    Signal("vn", SignalSource.internal(root, "vn").copy(attrs = attrs),
      daySpec, DimFilter.branchOf(daySpec, Seq("2026-08-10")))

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vout").toString

  test("versioned write/read round-trip; recompute flips the pointer; " +
    "older versions are GC'd to current + previous") {
    val root = tmpRoot()
    val s = sig(root)
    val part = s"$root/internal_data/vn/2026-08-10"
    def names = new java.io.File(part).list().toSet

    OutputWriter.write(spark, spark.range(10).toDF("id"), s)
    assert(names.exists(_.startsWith("data_v1-")) && names.contains("data_ptr.v1"))
    assert(names.contains("_SUCCESS") && names.contains("_SCHEMA.spark.json"))
    assert(InputLoader.load(spark, s, new FsProbe(spark)).count() == 10)

    // recompute: new version, pointer flips, reader sees the NEW data
    OutputWriter.write(spark, spark.range(25).toDF("id"), s)
    assert(names.exists(_.startsWith("data_v2-")) && names.contains("data_ptr.v2"))
    assert(InputLoader.load(spark, s, new FsProbe(spark)).count() == 25)
    // current + previous survive (a reader mid-scan of v1 finishes)
    assert(names.exists(_.startsWith("data_v1-")))

    // third write GC's v1
    OutputWriter.write(spark, spark.range(7).toDF("id"), s)
    assert(names.exists(_.startsWith("data_v3-")) &&
      names.exists(_.startsWith("data_v2-")))
    assert(!names.exists(_.startsWith("data_v1-")) &&
      !names.contains("data_ptr.v1"))
    assert(InputLoader.load(spark, s, new FsProbe(spark)).count() == 7)
  }

  test("a losing concurrent recompute never corrupts the committed " +
    "version: disjoint dirs, loud pointer CAS, orphan ages out") {
    val root = tmpRoot()
    val s = sig(root)
    val part = s"$root/internal_data/vn/2026-08-10"
    def names = new java.io.File(part).list().toSet
    OutputWriter.write(spark, spark.range(10).toDF("id"), s)
    // simulate the LOSER of a seq-2 race: its unique dir landed fully
    // (own _SUCCESS) but its pointer CAS lost — a pre-committed orphan
    val orphan = new java.io.File(s"$part/data_v2-loser00")
    assert(orphan.mkdirs())
    new java.io.FileOutputStream(
      new java.io.File(orphan, "_SUCCESS")).close()
    // the next write commits the REAL v2; the orphan must not be read
    OutputWriter.write(spark, spark.range(20).toDF("id"), s)
    assert(InputLoader.load(spark, s, new FsProbe(spark)).count() == 20)
    assert(names.contains("data_v2-loser00"), "orphan GC'd too early")
    // two more writes age the orphan out (gc parses the leading seq)
    OutputWriter.write(spark, spark.range(30).toDF("id"), s)
    OutputWriter.write(spark, spark.range(40).toDF("id"), s)
    assert(!names.contains("data_v2-loser00"), "orphan survived gc")
    assert(InputLoader.load(spark, s, new FsProbe(spark)).count() == 40)
  }

  test("a reader resolved BEFORE a recompute keeps reading intact files " +
    "through the rewrite (the in-place REPLACE window, closed)") {
    val root = tmpRoot()
    val s = sig(root)
    val probe = new FsProbe(spark)
    OutputWriter.write(spark, spark.range(1000).toDF("id"), s)
    // resolve (plan) the read against the committed v1 ...
    val reader = InputLoader.load(spark, s, probe)
    // ... then a recompute lands v2 and flips the pointer
    OutputWriter.write(spark,
      spark.range(500).select((org.apache.spark.sql.functions.col("id")
        + 100000L).as("id")), s)
    // the pre-recompute reader still scans the v1 files it resolved —
    // complete and intact (an in-place overwrite would have cleared
    // them mid-scan: 0 rows or FileNotFound)
    val got = reader.agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("id"))).collect().head
    assert(got.getLong(0) == 1000L && got.getLong(1) == 999L,
      s"pre-recompute reader saw a torn view: $got")
    // a FRESH read resolves v2
    assert(InputLoader.load(spark, s, probe).count() == 500)
  }

  test("guards: versioned excludes APPEND and dataFolder; compaction " +
    "refuses the versioned layout") {
    val root = tmpRoot()
    val eApp = intercept[IllegalArgumentException] {
      OutputWriter.write(spark, spark.range(1).toDF("id"),
        sig(root, DatasetAttrs(versioned = true,
          datasetType = DatasetType.APPEND)))
    }
    assert(eApp.getMessage.contains("REPLACE-only"), eApp.getMessage)
    val eDf = intercept[IllegalArgumentException] {
      OutputWriter.write(spark, spark.range(1).toDF("id"),
        sig(root, DatasetAttrs(versioned = true,
          dataFolder = Some("data"))))
    }
    assert(eDf.getMessage.contains("dataFolder"), eDf.getMessage)

    val s = sig(root)
    OutputWriter.write(spark, spark.range(10).toDF("id"), s)
    val eComp = intercept[IllegalArgumentException] {
      Compaction.compactPartition(spark, s, 64L << 20)
    }
    assert(eComp.getMessage.contains("versioned"), eComp.getMessage)

    // compactDirKv must refuse too (r18): pointed at a data_v<N> dir
    // INSIDE a versioned partition (pointers live in the PARENT) it
    // would otherwise in-place swap files of a version a reader may
    // hold, bypassing the pointer commit
    val part = new java.io.File(s"$root/internal_data/vn/2026-08-10")
    val vDir = part.list().find(_.startsWith("data_v1-")).get
    val kv = new graft.routing.InMemoryConditionalKv
    val eDir = intercept[IllegalArgumentException] {
      Compaction.compactDirKv(spark, s"${part.getPath}/$vDir",
        64L << 20, kv)
    }
    assert(eDir.getMessage.contains("versioned"), eDir.getMessage)
    // and pointed at the partition root itself (pointers right there)
    val eRoot = intercept[IllegalArgumentException] {
      Compaction.compactDirKv(spark, part.getPath, 64L << 20, kv)
    }
    assert(eRoot.getMessage.contains("versioned"), eRoot.getMessage)
  }
}
