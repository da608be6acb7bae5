package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native avro container format: round-trips, schema inference,
  * nullability, nested types, codecs, and projection pushdown-by-name. */
class AvroFormatSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    work = java.nio.file.Files.createTempDirectory("graft_avro").toString
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("primitive + temporal round-trip with inference") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, 7, 1.5f, 2.5, true, "alpha", Array[Byte](1, 2),
        java.sql.Date.valueOf("2026-08-14"),
        java.sql.Timestamp.valueOf("2026-08-14 12:34:56.789123")),
      (2L, 8, -1.5f, -2.5, false, "beta", Array[Byte](3),
        java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.000001")))
      .toDF("l", "i", "f", "d", "b", "s", "bin", "dt", "ts")
    df.write.mode("overwrite").format("avro").save(s"$work/prim")
    val back = spark.read.format("avro").load(s"$work/prim")
    assert(back.schema("dt").dataType == org.apache.spark.sql.types.DateType)
    assert(back.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val a = df.orderBy("l").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    val b = back.orderBy("l").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    assert(a.toSeq == b.toSeq)
  }

  test("nulls, arrays, maps, structs round-trip") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Some("x"), Seq(1, 2, 3), Map("a" -> 1.0), ("in", 9L)),
      (2L, None, Seq.empty[Int], Map.empty[String, Double], ("er", -1L)))
      .toDF("id", "opt", "arr", "m", "st")
    df.write.mode("overwrite").format("avro").save(s"$work/nested")
    val back = spark.read.format("avro").load(s"$work/nested").orderBy("id")
    val rows = back.collect()
    assert(rows(1).isNullAt(1))
    assert(rows(0).getSeq[Int](2) == Seq(1, 2, 3))
    assert(rows(0).getAs[Map[String, Double]]("m") == Map("a" -> 1.0))
    assert(rows(0).getAs[org.apache.spark.sql.Row]("st").getLong(1) == 9L)
    assert(back.count() == 2)
  }

  test("projection by name + aggregate over an avro scan") {
    val sp = spark; import sp.implicits._
    (1L to 100L).map(i => (i, s"doc$i", i * 2.0)).toDF("id", "name", "v")
      .repartition(4)
      .write.mode("overwrite").format("avro").save(s"$work/agg")
    val got = spark.read.format("avro").load(s"$work/agg")
      .agg(sum("v").as("s"), count(lit(1)).as("n")).collect().head
    assert(got.getDouble(0) == (1 to 100).map(_ * 2.0).sum && got.getLong(1) == 100L)
  }

  test("deflate and uncompressed codecs read back") {
    val sp = spark; import sp.implicits._
    for (c <- Seq("deflate", "uncompressed")) {
      Seq((1, "a"), (2, "b")).toDF("k", "v").write.mode("overwrite")
        .format("avro").option("compression", c).save(s"$work/codec_$c")
      assert(spark.read.format("avro").load(s"$work/codec_$c").count() == 2)
    }
  }

  test("unknown codec fails on the driver before any job launches") {
    val sp = spark; import sp.implicits._
    val e = intercept[IllegalArgumentException] {
      Seq((1, "a")).toDF("k", "v").write.mode("overwrite")
        .format("avro").option("compression", "zstd99")
        .save(s"$work/codec_bad")
    }
    assert(e.getMessage.contains("zstd99"))
  }

  test("[null, record] top-level container reads; null datums skip") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val rec = SchemaBuilder.record("row").fields()
      .requiredLong("id").requiredString("s").endRecord()
    val union = Schema.createUnion(
      Schema.create(Schema.Type.NULL), rec)
    val dir = new java.io.File(s"$work/union_top"); dir.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](union))
    w.create(union, new java.io.File(dir, "data.avro"))
    val r1 = new GenericData.Record(rec); r1.put("id", 1L); r1.put("s", "a")
    val r2 = new GenericData.Record(rec); r2.put("id", 2L); r2.put("s", "b")
    w.append(r1); w.append(null); w.append(r2); w.close()
    // planning unwraps the union AND the reader handles it identically —
    // before, inference succeeded and every task crashed on getField
    val got = spark.read.format("avro").load(s"$work/union_top")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
  }

  test("recursive avro schemas fail cleanly, not with a StackOverflow") {
    import org.apache.avro.Schema
    val recursive = new Schema.Parser().parse(
      """{"type":"record","name":"Node","fields":[
         {"name":"v","type":"long"},
         {"name":"next","type":["null","Node"],"default":null}]}""")
    val e = intercept[UnsupportedOperationException](
      AvroConversions.toSqlType(recursive))
    assert(e.getMessage.contains("recursive") ||
      e.getMessage.contains("nesting"))
  }
}
