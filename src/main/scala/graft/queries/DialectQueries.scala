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

  /** The silent-divergence idioms (round 12): Presto's literal-delimiter
    * split vs Spark's regex split (a '.' delimiter), MySQL-style
    * date_format %-codes vs Java patterns (with a literal pattern
    * letter), element_at's NULL-past-bounds vs Spark's ANSI error, and
    * CROSS JOIN UNNEST → LATERAL VIEW explode. */
  private val prestoBreadthSql =
    """SELECT "event_id" AS event_id, part,
       date_format("ts", '%Y-%m-%dT%H') AS hour_key,
       element_at(split("event_type" || '.' || 'x', '.'), 5) AS missing
       FROM events CROSS JOIN UNNEST(split("event_type", 'i')) AS t (part)
       WHERE "event_type" = 'click'
       ORDER BY event_id, part"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_presto_dialect" -> ((s, dir) => {
      EventTables.events(s, dir).createOrReplaceTempView("events")
      s.sql(PrestoDialect.translate(prestoSql))
    }),
    "q44_presto_breadth" -> ((s, dir) => {
      EventTables.events(s, dir).createOrReplaceTempView("events")
      s.sql(PrestoDialect.translate(prestoBreadthSql))
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
    "q44_presto_breadth" ->
      """SELECT event_id,
                UNNEST(string_split(event_type, 'i')) AS part,
                strftime(ts, '%Y-%m-%dT%H') AS hour_key,
                list_extract(string_split(event_type || '.' || 'x', '.'), 5)
                  AS missing
         FROM events WHERE event_type = 'click'
         ORDER BY event_id, part""",
  )
}
