package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loader for the driver-generated `events` table, robust to the parquet
  * timestamp resolution of the generation that wrote it: `ts` has shipped
  * both as TIMESTAMP(NANOS) (readable only as a nanos BIGINT under
  * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
  * (a plain timestamp column). Every gated query goes through
  * [[EventTables.events]], which normalizes either form to one
  * session-timezone TIMESTAMP column — the oracles read the same file
  * natively in DuckDB, so value semantics are identical on both sides. */
object EventTables {

  /** `events.parquet` under `dir` with `ts` normalized to TIMESTAMP. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // harmless when ts is MICROS; required to make NANOS readable at all
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long generation: truncate to micros
        raw.withColumn("ts",
          timestamp_micros((col("ts") / 1000L).cast("long")))
      case _ => // micros generation (TIMESTAMP_NTZ): session tz is UTC,
        // so the NTZ→LTZ cast preserves the stored wall-clock instant
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
