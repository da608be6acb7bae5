package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Gate rows for the temporal join operators ([[graft.operators.Temporal]])
  * against DuckDB: the as-of join replays as DuckDB's native ASOF JOIN,
  * the bucketized range join as a plain inequality join (DuckDB runs it
  * as an IEJoin — same rows, different plan, which is exactly the
  * point: our side must produce identical pairs WITHOUT an
  * inequality-join plan). */
object TemporalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- as-of join: each click attaches the latest view (same user,
    // view.ts <= click.ts); inner semantics to match DuckDB's default
    "q36_asof_join" -> ((s, dir) => {
      val ev = EventTables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      Temporal.asofJoin(clicks, views, "user_id", "ts",
          rightCols = Seq("value"), tieCol = "event_id")
        .where(col("asof_event_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"),
          col("asof_value").as("view_value"))
        .orderBy("event_id")
    }),

    // ---- range join: clicks within the hour after an error by the same
    // user — intervals bucketized at 10 min (each interval spans ~7
    // buckets, so replication + single-bucket point matching are both
    // exercised), then exact containment
    "q37_range_join" -> ((s, dir) => {
      val ev = EventTables.events(s, dir)
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + 3600000000L).as("end_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("pt_us"))
      Temporal.rangeJoin(clicks, errors, "user_id", "pt_us",
          "start_us", "end_us", bucketWidth = 600000000L)
        .select(col("error_id"), col("click_id"),
          (col("pt_us") - col("start_us")).as("gap_us"))
        .orderBy("error_id", "click_id")
    }),
    // ---- broadcast as-of (state attach): SAME semantics and oracle as
    // q36 through the zero-shuffle physical path — the views side packs
    // into per-user sorted arrays and broadcasts; clicks never shuffle
    "q40_asof_state_attach" -> ((s, dir) => {
      val ev = EventTables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      Temporal.asofJoinBroadcast(clicks, views, "user_id", "ts",
          rightCols = Seq("value"), tieCol = "event_id")
        .where(col("asof_event_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"),
          col("asof_value").as("view_value"))
        .orderBy("event_id")
    }),

    // ---- interval overlap join: 1-hour error spans × 1-hour purchase
    // spans per user — both sides bucket-replicated, pairs deduped
    // positionally (emitted only from the first shared bucket)
    "q39_interval_overlap" -> ((s, dir) => {
      val ev = EventTables.events(s, dir)
      def spans(t: String, idAs: String, s0: String, e0: String) =
        ev.where(col("event_type") === t)
          .select(col("event_id").as(idAs), col("user_id"),
            unix_micros(col("ts")).as(s0),
            (unix_micros(col("ts")) + 3600000000L).as(e0))
      Temporal.intervalOverlapJoin(
          spans("error", "error_id", "err_start", "err_end"),
          spans("purchase", "purchase_id", "pur_start", "pur_end"),
          "user_id", "err_start", "err_end", "pur_start", "pur_end",
          bucketWidth = 1800000000L)
        .select(col("error_id"), col("purchase_id"),
          (col("pur_start") - col("err_start")).as("offset_us"))
        .orderBy("error_id", "purchase_id")
    }),

    // ---- sessionization: per-user sessions at a 6-hour inactivity gap,
    // aggregated per session (events, value sum, start/end) — the
    // row-tagging sessionize underneath is what a pipeline uses to
    // attach session context to training examples
    "q38_sessionize" -> ((s, dir) => {
      val ev = EventTables.events(s, dir)
        .select(col("user_id"), col("ts"), col("value"))
      Temporal.sessionize(ev, "user_id", "ts", gapMicros = 21600000000L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("total_value"))
        .orderBy("user_id", "session_seq")
    }),
    // ---- skew-robust as-of: SAME semantics and oracle as q36 through
    // the hot-key pre-split path (per-(key, time-chunk) windows +
    // carried boundary state) — the gate pins the chunked plan to the
    // identical row set
    "q42_asof_skew" -> ((s, dir) => {
      val ev = EventTables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      Temporal.asofJoinSkew(clicks, views, "user_id", "ts",
          rightCols = Seq("value"), tieCol = "event_id",
          chunkWidth = 86400000000L) // 1-day chunks
        .where(col("asof_event_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"),
          col("asof_value").as("view_value"))
        .orderBy("event_id")
    }),

    // ---- skew-robust sessionize: SAME semantics and oracle as q38
    // through the chunked two-phase path (local sessions + boundary
    // merge over the per-chunk summary)
    "q43_sessionize_skew" -> ((s, dir) => {
      val ev = EventTables.events(s, dir)
        .select(col("user_id"), col("ts"), col("value"))
      Temporal.sessionizeSkew(ev, "user_id", "ts",
          gapMicros = 21600000000L, chunkWidth = 86400000000L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("total_value"))
        .orderBy("user_id", "session_seq")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q36_asof_join" ->
      """SELECT l.event_id AS event_id, l.user_id AS user_id,
                r.event_id AS view_id,
                epoch_us(l.ts) - epoch_us(r.ts) AS gap_us,
                r.value AS view_value
         FROM (SELECT * FROM events WHERE event_type='click') l
         ASOF JOIN (SELECT * FROM events WHERE event_type='view') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY event_id""",
    "q37_range_join" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id,
                epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type='click') c
         JOIN (SELECT * FROM events WHERE event_type='error') e
           ON e.user_id = c.user_id
          AND epoch_us(c.ts) BETWEEN epoch_us(e.ts)
                                 AND epoch_us(e.ts) + 3600000000
         ORDER BY error_id, click_id""",
    "q40_asof_state_attach" ->
      """SELECT l.event_id AS event_id, l.user_id AS user_id,
                r.event_id AS view_id,
                epoch_us(l.ts) - epoch_us(r.ts) AS gap_us,
                r.value AS view_value
         FROM (SELECT * FROM events WHERE event_type='click') l
         ASOF JOIN (SELECT * FROM events WHERE event_type='view') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY event_id""",
    "q39_interval_overlap" ->
      """SELECT a.event_id AS error_id, b.event_id AS purchase_id,
                epoch_us(b.ts) - epoch_us(a.ts) AS offset_us
         FROM (SELECT * FROM events WHERE event_type='error') a
         JOIN (SELECT * FROM events WHERE event_type='purchase') b
           ON a.user_id = b.user_id
          AND epoch_us(a.ts) <= epoch_us(b.ts) + 3600000000
          AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
         ORDER BY error_id, purchase_id""",
    "q42_asof_skew" ->
      """SELECT l.event_id AS event_id, l.user_id AS user_id,
                r.event_id AS view_id,
                epoch_us(l.ts) - epoch_us(r.ts) AS gap_us,
                r.value AS view_value
         FROM (SELECT * FROM events WHERE event_type='click') l
         ASOF JOIN (SELECT * FROM events WHERE event_type='view') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY event_id""",
    "q43_sessionize_skew" ->
      """WITH d AS (
           SELECT user_id, ts, value,
                  CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                          > 21600000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts, value,
                  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    AS session_seq
           FROM d)
         SELECT user_id, session_seq,
                COUNT(*) AS n_events,
                MIN(epoch_us(ts)) AS start_us,
                MAX(epoch_us(ts)) AS end_us,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                  AS total_value
         FROM s GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
    "q38_sessionize" ->
      """WITH d AS (
           SELECT user_id, ts, value,
                  CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                          > 21600000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts, value,
                  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    AS session_seq
           FROM d)
         SELECT user_id, session_seq,
                COUNT(*) AS n_events,
                MIN(epoch_us(ts)) AS start_us,
                MAX(epoch_us(ts)) AS end_us,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                  AS total_value
         FROM s GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
  )
}
