package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.compute.PrestoDialect

/** Gate row for the PrestoSQL dialect shim: a query written in Athena/
  * Presto idioms (unit-bearing date_add/date_diff, json_extract_scalar,
  * strpos, varchar casts, double-quoted identifiers) runs through
  * [[PrestoDialect.translate]] on Spark and must match a DuckDB oracle
  * that replays the SEMANTICS natively (complete-day diffs via epoch
  * arithmetic — DuckDB's own date_diff counts boundary crossings, which
  * is exactly the dialect trap the shim exists to paper over). */
object DialectQueries {

  private val prestoSql =
    """SELECT "event_id" AS event_id,
       CAST(json_extract_scalar("props", '$.k') AS varchar) AS k_str,
       to_unixtime(date_add('hour', 2, "ts")) AS ts_plus2h_s,
       strpos("event_type", 'ic') AS pos_ic,
       date_diff('day', TIMESTAMP '2024-01-01 00:00:00', "ts") AS days_since
       FROM events WHERE "event_type" = 'click'
       ORDER BY event_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_presto_dialect" -> ((s, dir) => {
      EventTables.events(s, dir).createOrReplaceTempView("events")
      s.sql(PrestoDialect.translate(prestoSql))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q41_presto_dialect" ->
      """SELECT event_id,
                json_extract_string(props, '$.k') AS k_str,
                CAST(FLOOR(epoch(ts + INTERVAL 2 HOUR)) AS BIGINT)
                  AS ts_plus2h_s,
                strpos(event_type, 'ic') AS pos_ic,
                CAST(FLOOR(epoch(ts - TIMESTAMP '2024-01-01 00:00:00')
                           / 86400) AS BIGINT) AS days_since
         FROM events WHERE event_type = 'click'
         ORDER BY event_id""",
  )
}
