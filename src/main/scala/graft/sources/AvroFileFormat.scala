package graft.sources

import org.apache.avro.{JsonProperties, LogicalType, LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Hadoop `Configuration` is not `java.io.Serializable`; ship it to
  * executors through its own Writable form. (Spark's internal
  * SerializableConfiguration is `private[spark]` — this is the same
  * 10-line idea, written against the public Hadoop API.) */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Spark ⇄ Avro type mapping for the container-file format: primitives,
  * date (int/`date`), timestamp (long/`timestamp-micros`, reading
  * `timestamp-millis` too), binary/fixed, enum (as string), and
  * recursively struct / array / map-with-string-keys. Nullability is a
  * 2-branch `[null, T]` union. Decimals, intervals, and wider unions are
  * rejected up front ([[AvroFileFormat.supportDataType]]) instead of
  * corrupting silently. */
private[sources] object AvroConversions {

  def toAvroSchema(dt: DataType, name: String, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvroSchema(et, s"${name}_item", containsNull))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(toAvroSchema(vt, s"${name}_value", valueContainsNull))
      case st: StructType =>
        val rec = Schema.createRecord(name, null, "graft.avro", false)
        rec.setFields(st.fields.map { f =>
          val fieldSchema = toAvroSchema(f.dataType, s"${name}_${f.name}", f.nullable)
          val default: AnyRef =
            if (f.nullable) JsonProperties.NULL_VALUE else null
          new Schema.Field(f.name, fieldSchema, null, default)
        }.toList.asJava)
        rec
      case other =>
        throw new UnsupportedOperationException(
          s"graft avro: unsupported Spark type $other")
    }
    if (nullable && base.getType != Schema.Type.UNION)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  /** (catalyst type, nullable) for an avro schema. `depth` guards
    * RECURSIVE schemas (legal in Avro, unrepresentable in a Catalyst
    * StructType): without it the record→union→record cycle would
    * StackOverflow at planning instead of failing cleanly. */
  def toSqlType(s: Schema, depth: Int = 0): (DataType, Boolean) = {
    if (depth > 64)
      throw new UnsupportedOperationException(
        "graft avro: schema nesting exceeds 64 levels — recursive avro " +
          "schemas have no StructType equivalent")
    toSqlType0(s, depth)
  }

  private def toSqlType0(s: Schema, depth: Int): (DataType, Boolean) =
    s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toList
      branches.filterNot(_.getType == Schema.Type.NULL) match {
        case one :: Nil if branches.exists(_.getType == Schema.Type.NULL) =>
          (toSqlType(one, depth + 1)._1, true)
        case _ =>
          throw new UnsupportedOperationException(
            s"graft avro: only [null, T] unions are supported, got $s")
      }
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
          (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.map { f =>
        val (dt, nullable) = toSqlType(f.schema(), depth + 1)
        StructField(f.name(), dt, nullable)
      }.toArray), false)
    case Schema.Type.ARRAY =>
      val (et, n) = toSqlType(s.getElementType, depth + 1)
      (ArrayType(et, n), false)
    case Schema.Type.MAP =>
      val (vt, n) = toSqlType(s.getValueType, depth + 1)
      (MapType(StringType, vt, n), false)
    case other =>
      throw new UnsupportedOperationException(s"graft avro: $other")
  }

  /** Unwrap a top-level `[null, record]` union (files written by tools
    * that mark the whole row nullable) and insist on a record — the
    * shapes [[toSqlType]] accepts at planning must be exactly the
    * shapes the reader handles at run time. */
  def topLevelRecord(raw: Schema): Schema = {
    val s =
      if (raw.getType == Schema.Type.UNION)
        raw.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
          .toList match {
          case one :: Nil => one
          case _ => raw
        }
      else raw
    if (s.getType != Schema.Type.RECORD)
      throw new UnsupportedOperationException(
        s"graft avro: top-level schema must be a record (or " +
          s"[null, record]), got ${s.getType}")
    s
  }

  /** Avro runtime value → Catalyst value (for `catalystType`). */
  def avroToCatalyst(value: AnyRef, avro: Schema, catalystType: DataType): Any = {
    if (value == null) return null
    val resolved =
      if (avro.getType == Schema.Type.UNION)
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(avro)
      else avro
    (resolved.getType, catalystType) match {
      case (_, StringType) => UTF8String.fromString(value.toString)
      case (Schema.Type.BYTES, BinaryType) =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case (Schema.Type.FIXED, BinaryType) =>
        value.asInstanceOf[GenericFixed].bytes().clone()
      case (Schema.Type.LONG, TimestampType)
          if resolved.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
        value.asInstanceOf[java.lang.Long].longValue() * 1000L
      case (Schema.Type.RECORD, st: StructType) =>
        val rec = value.asInstanceOf[GenericRecord]
        val vals = st.fields.map { f =>
          val fld = resolved.getField(f.name)
          if (fld == null) null
          else avroToCatalyst(rec.get(fld.pos()).asInstanceOf[AnyRef],
            fld.schema(), f.dataType)
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val xs = value.asInstanceOf[java.util.Collection[AnyRef]].asScala
        new GenericArrayData(
          xs.map(avroToCatalyst(_, resolved.getElementType, et)).toArray)
      case (Schema.Type.MAP, MapType(StringType, vt, _)) =>
        // one entrySet pass: separate keys/values iterations only agree
        // by de-facto HashMap behavior, not by Map contract
        val entries = value.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
          .entrySet().asScala.toArray
        val keys = entries.map(e =>
          UTF8String.fromString(e.getKey.toString): Any)
        val vals = entries.map(e =>
          avroToCatalyst(e.getValue, resolved.getValueType, vt))
        ArrayBasedMapData(keys, vals)
      case (_, ByteType) => value.asInstanceOf[java.lang.Integer].byteValue()
      case (_, ShortType) => value.asInstanceOf[java.lang.Integer].shortValue()
      case _ => value // int/long/float/double/boolean, date days, micros
    }
  }

  /** Catalyst value (from an InternalRow getter) → Avro runtime value. */
  def catalystToAvro(value: Any, dt: DataType, avro: Schema): AnyRef = {
    if (value == null) return null
    val resolved =
      if (avro.getType == Schema.Type.UNION)
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(avro)
      else avro
    dt match {
      case StringType => value.asInstanceOf[UTF8String].toString
      case BinaryType => java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case ByteType => Int.box(value.asInstanceOf[Byte].toInt)
      case ShortType => Int.box(value.asInstanceOf[Short].toInt)
      case st: StructType =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(resolved)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(i, catalystToAvro(row.get(i, f.dataType), f.dataType,
            resolved.getFields.get(i).schema()))
        }
        rec
      case ArrayType(et, _) =>
        val arr = value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(catalystToAvro(arr.get(i, et), et, resolved.getElementType))
          i += 1
        }
        out
      case MapType(StringType, vt, _) =>
        val m = value.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val out = new java.util.HashMap[String, AnyRef](m.numElements())
        val keys = m.keyArray(); val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          out.put(keys.getUTF8String(i).toString,
            catalystToAvro(vals.get(i, vt), vt, resolved.getValueType))
          i += 1
        }
        out
      case _ => value.asInstanceOf[AnyRef] // boxed primitive / days / micros
    }
  }
}

/** Native Avro container-file support (read + write + schema inference)
  * built directly on avro-core — registered under the standard `avro`
  * short name, so `spark.read.format("avro")` and the managed sink's
  * generic format path work without the separately-deployed spark-avro
  * module. Reference format matrix: S1 in SURVEY.md §2 (the reference
  * accepts avro external datasets via its data_format attribute,
  * signal_source.py).
  *
  * Scale posture: one task per .avro FILE (`isSplitable = false` — no
  * sync-marker block splitting), so parallelism comes from file count;
  * a 100-TB avro corpus laid out as many files scans wide, a single
  * monolithic file does not (acceptable for the ingest-format role this
  * plays — columnar storage should be parquet). Row decode is
  * per-record generic (no vectorization), which is the nature of a
  * row-major container format. */
final class AvroFileFormat extends FileFormat with DataSourceRegister
    with Serializable {

  override def shortName(): String = "avro"
  override def toString: String = "graft-avro"
  override def hashCode(): Int = getClass.hashCode()
  override def equals(other: Any): Boolean = other.isInstanceOf[AvroFileFormat]

  override def isSplitable(sparkSession: SparkSession,
                           options: Map[String, String], path: Path): Boolean =
    false

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType => true
    case ArrayType(et, _) => supportDataType(et)
    case MapType(StringType, vt, _) => supportDataType(vt)
    case st: StructType => st.fields.forall(f => supportDataType(f.dataType))
    case _ => false
  }

  override def inferSchema(sparkSession: SparkSession,
                           options: Map[String, String],
                           files: Seq[FileStatus]): Option[StructType] = {
    val conf = sparkSession.sessionState.newHadoopConf()
    files.find(f => f.getLen > 0 && f.getPath.getName.endsWith(".avro"))
      .map { f =>
        val reader = DataFileReader.openReader(
          new FsInput(f.getPath, conf), new GenericDatumReader[GenericRecord]())
        try AvroConversions.toSqlType(
            AvroConversions.topLevelRecord(reader.getSchema))._1
          .asInstanceOf[StructType]
        finally reader.close()
      }
  }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory = {
    val avroJson = AvroConversions
      .toAvroSchema(dataSchema, "topLevelRecord", nullable = false).toString
    val codec = options.getOrElse("compression",
      sparkSession.conf.get("spark.sql.avro.compression.codec", "snappy"))
    // fail an unknown codec HERE on the driver — inside AvroRowWriter it
    // would fail every task (with retries) after the job already launched
    require(Set("snappy", "deflate", "uncompressed", "null", "none")
        .contains(codec),
      s"graft avro: unknown compression codec '$codec'")
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".avro"
      override def newInstance(path: String, dataSchema: StructType,
                               context: TaskAttemptContext): OutputWriter =
        new AvroRowWriter(path, dataSchema, avroJson, codec, context)
    }
  }

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
                           partitionSchema: StructType, requiredSchema: StructType,
                           filters: Seq[Filter], options: Map[String, String],
                           hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val confSer = new SerializableHadoopConf(hadoopConf)
    val required = requiredSchema // serializable
    (file: PartitionedFile) => {
      // file.toPath URL-decodes; Path(urlEncodedPath) would keep %20
      // etc. literal and fail to open paths with spaces
      val path = file.toPath
      val reader = DataFileReader.openReader(
        new FsInput(path, confSer.value),
        new GenericDatumReader[GenericRecord]())
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.close()))
      // same top-level unwrap as inferSchema: a [null, record] container
      // must not plan fine then crash every task on getField
      val fileSchema = AvroConversions.topLevelRecord(reader.getSchema)
      // project by NAME against this file's writer schema — a field the
      // file lacks reads as null (schema-evolution tolerance)
      val fieldOf = required.fields.map(f => Option(fileSchema.getField(f.name)))
      // a [null, record] container may carry null DATUMS — skip them (no
      // Catalyst row shape exists for "the whole row is null")
      reader.iterator().asScala.filter(_ != null).map { rec =>
        val vals = new Array[Any](required.length)
        var i = 0
        while (i < required.length) {
          vals(i) = fieldOf(i) match {
            case Some(fld) => AvroConversions.avroToCatalyst(
              rec.get(fld.pos()).asInstanceOf[AnyRef], fld.schema(),
              required.fields(i).dataType)
            case None => null
          }
          i += 1
        }
        new GenericInternalRow(vals): InternalRow
      }
    }
  }
}

/** Per-task avro writer: one container file, records appended through
  * the catalyst→generic conversion; codec from the `compression` option
  * (snappy default, deflate/null accepted). */
private[sources] final class AvroRowWriter(
    val path: String, dataSchema: StructType, avroSchemaJson: String,
    codec: String, context: TaskAttemptContext) extends OutputWriter {

  private val schema = new Schema.Parser().parse(avroSchemaJson)
  private val writer = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    codec match {
      case "snappy" => w.setCodec(CodecFactory.snappyCodec())
      case "deflate" => w.setCodec(CodecFactory.deflateCodec(6))
      case "uncompressed" | "null" | "none" => ()
      case other => throw new IllegalArgumentException(
        s"graft avro: unknown compression codec '$other'")
    }
    val p = new Path(path)
    w.create(schema, p.getFileSystem(context.getConfiguration).create(p, true))
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < dataSchema.length) {
      val f = dataSchema.fields(i)
      rec.put(i, AvroConversions.catalystToAvro(
        row.get(i, f.dataType), f.dataType, schema.getFields.get(i).schema()))
      i += 1
    }
    writer.append(rec)
    ()
  }

  override def close(): Unit = writer.close()
}
