package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.diagnostics._

/** Metric/alarm evaluation (M1-M4) oracle-checked over the `events` table
  * treated as a metric stream: name=event_type, value=value, time=ts. The
  * oracles replay the identical windowed semantics in DuckDB SQL. */
object DiagnosticsQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    EventTables.events(s, dir)

  private val DaySecs = 86400L

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def cleanupAtExit(dir: String): Unit =
    if (cleanupRegistered.add(dir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(dir))
      }))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- M2: daily statistic evaluation of every metric name (values fed
    // as decimals so sum/avg are exact and order-independent)
    "m01_metric_stats" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("value",
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
      Metrics.evaluateAll(ev, "event_type", "value", "ts", DaySecs)
        // avg is excluded from the oracle surface: sum/count division ties
        // at the rounding boundary differ between decimal and double
        // arithmetic by construction (exactness covered in ScalaTest)
        .select(col("name"),
          date_format(col("period_start"), "yyyy-MM-dd").as("day"),
          round(col("sum"), 4).as("sum"),
          round(col("min"), 4).as("min"), round(col("max"), 4).as("max"),
          col("sample_count"), round(col("p50"), 4).as("p50"))
        .orderBy("name", "day")
    }),

    // ---- M3: N-of-M alarm over the daily error-rate metric
    "m02_alarm_eval" -> ((s, dir) => {
      val series = Metrics.evaluate(events(s, dir)
          .where(col("event_type") === "error"),
        "event_type", "value", "ts", DaySecs, MetricStatistic.SAMPLE_COUNT)
      Alarms.evaluate(series,
          AlarmParams(45.0, AlarmComparison.GreaterThanOrEqualToThreshold,
            evaluationPeriods = 3, datapointsToAlarm = 2), DaySecs)
        .select(date_format(col("period_start"), "yyyy-MM-dd").as("day"),
          col("value"), col("state"))
        .orderBy("day")
    }),

    // ---- metric math: derived error-rate-percent series feeding an alarm
    "m04_metric_math" -> ((s, dir) => {
      val ev = events(s, dir)
      def dailyCount(typ: String) = Metrics.evaluate(
        ev.where(col("event_type") === typ),
        "event_type", "value", "ts", DaySecs, MetricStatistic.SAMPLE_COUNT)
      val rate = MetricMath.evaluate(
        Map("err" -> dailyCount("error"), "vw" -> dailyCount("view")),
        "(err / vw) * 100", alias = "error_rate_pct")
      Alarms.evaluate(rate,
          AlarmParams(100.0, AlarmComparison.GreaterThanOrEqualToThreshold,
            evaluationPeriods = 2, datapointsToAlarm = 1), DaySecs)
        .select(col("name"),
          date_format(col("period_start"), "yyyy-MM-dd").as("day"),
          round(col("value"), 4).as("value"), col("state"))
        .orderBy("day")
    }),

    // ---- metric→alarm→node automation: the monitor watches the daily
    // error-count series, raises each state TRANSITION into routing, and
    // every OK/INSUFFICIENT→ALARM edge triggers a downstream node whose
    // output partitions are the query result — no manual raiseAlarm
    // (reference chain application.py:826-1005 + platform alarm ingestion)
    "m05_metric_triggered_alarm" -> ((s, dir) => {
      import graft.app.Application
      import graft.compute.SqlSlot
      // per-JVM app root: concurrent runs at the same SF must not race on
      // one another's managed output partitions (same fix as fw10); the
      // per-pid tree is torn down at JVM exit so repeated runs don't
      // accumulate /tmp garbage
      val w = s"/tmp/graft_m05_${new java.io.File(dir).getName}" +
        s"_${ProcessHandle.current().pid()}"
      DiagnosticsQueries.cleanupAtExit(w)
      val app = new Application("m05", s, s"$w/app_m05")
      // scale-invariant series: daily error count normalized by the
      // overall daily average — the alarm pattern is meaningful at every
      // SF instead of saturating with corpus size
      val alarm = app.createMetricAlarm("err_daily",
        () => {
          val counts = Metrics.evaluate(
            events(s, dir).where(col("event_type") === "error"),
            "event_type", "value", "ts", DaySecs, MetricStatistic.SAMPLE_COUNT)
          counts.withColumn("value", col("value") /
            avg("value").over(org.apache.spark.sql.expressions.Window
              .partitionBy("name")))
        },
        AlarmParams(1.01, AlarmComparison.GreaterThanOrEqualToThreshold,
          evaluationPeriods = 3, datapointsToAlarm = 2), DaySecs,
        timeFormat = "%Y-%m-%d")
      val node = app.createData("on_alarm", Seq(alarm("ALARM", "*")),
        Seq(SqlSlot("SELECT '{time}' AS day")))
      app.activate()
      val transitions = app.alarmMonitor().poll()
      val alarmDays = transitions.filter(_.state == Alarms.ALARM)
      require(alarmDays.forall(_.completions.nonEmpty),
        "an ALARM transition did not trigger the downstream node")
      val sp = s
      import sp.implicits._
      alarmDays.map(t => app.load(node("ALARM", t.period.toLocalDate.toString)))
        .foldLeft(Seq.empty[String].toDF("day"))(_ unionAll _)
        .orderBy("day")
    }),

    // ---- EXTERNAL metric import → alarm → node: the metric rows live in
    // a parquet store some OTHER system produced (staged here from the
    // events table); marshalExternalMetric declares it, the monitor
    // evaluates the daily purchase count over the FILES (normalized by
    // the overall daily average so the pattern is scale-invariant, same
    // as m05) and every OK/INSUFFICIENT→ALARM edge triggers the node
    // (reference marshal_external_metric, application.py:600-670)
    "m06_external_metric_alarm" -> ((s, dir) => {
      import graft.app.Application
      import graft.compute.SqlSlot
      val w = s"/tmp/graft_m06_${new java.io.File(dir).getName}" +
        s"_${ProcessHandle.current().pid()}"
      DiagnosticsQueries.cleanupAtExit(w)
      // stage the external store: raw metric rows as a monitoring system
      // would drop them — (name, ts, value), one row per purchase event
      val store = s"$w/metric_store"
      events(s, dir).where(col("event_type") === "purchase")
        .select(col("event_type").as("name"), col("ts"), col("value"))
        .write.mode("overwrite").parquet(store)
      val app = new Application("m06", s, s"$w/app_m06")
      val metric = app.marshalExternalMetric("purchase_count", store)
      val alarm = app.createExternalMetricAlarm("purchase_daily", metric,
        MetricStatistic.SAMPLE_COUNT,
        AlarmParams(1.01, AlarmComparison.GreaterThanOrEqualToThreshold,
          evaluationPeriods = 3, datapointsToAlarm = 2), DaySecs,
        timeFormat = "%Y-%m-%d",
        transform = df => df.withColumn("value", col("value") /
          avg("value").over(org.apache.spark.sql.expressions.Window
            .partitionBy("name"))))
      val node = app.createData("on_purchase_alarm", Seq(alarm("ALARM", "*")),
        Seq(SqlSlot("SELECT '{time}' AS day")))
      app.activate()
      val transitions = app.alarmMonitor().poll()
      val alarmDays = transitions.filter(_.state == Alarms.ALARM)
      require(alarmDays.forall(_.completions.nonEmpty),
        "an ALARM transition did not trigger the downstream node")
      val sp = s
      import sp.implicits._
      alarmDays.map(t =>
          app.load(node("ALARM", t.period.toLocalDate.toString)))
        .foldLeft(Seq.empty[String].toDF("day"))(_ unionAll _)
        .orderBy("day")
    }),

    // ---- INTERNAL metric declaration → runtime emission → alarm → node:
    // the createMetric path end-to-end (reference create_metric,
    // application.py:671-750) — the metric group is declared in-app, the
    // events table is replayed through the runtime diagnostics store (the
    // emission face compute code uses), and the monitor evaluates the
    // SAME scale-invariant daily series as m05, so the oracle replays
    // identical ground truth while the Spark side exercises a disjoint
    // code path (in-memory store + internalMetricSeries, not file reads)
    "m08_internal_metric_alarm" -> ((s, dir) => {
      import graft.app.Application
      import graft.compute.SqlSlot
      val w = s"/tmp/graft_m08_${new java.io.File(dir).getName}" +
        s"_${ProcessHandle.current().pid()}"
      DiagnosticsQueries.cleanupAtExit(w)
      val app = new Application("m08", s, s"$w/app_m08")
      val g = app.createMetric("ops", timeFormat = "%Y-%m-%d")
      events(s, dir).where(col("event_type") === "error")
        .select(col("value").cast("double"), col("ts")).collect()
        .foreach(r => app.diagnostics("ops")("error")
          .emit(r.getDouble(0), r.getTimestamp(1)))
      val series = app.internalMetricSeries(g,
        MetricStatistic.SAMPLE_COUNT, DaySecs, name = Some("error"))
      val alarm = app.createMetricAlarm("ops_daily",
        () => series().withColumn("value", col("value") /
          avg("value").over(org.apache.spark.sql.expressions.Window
            .partitionBy("name"))),
        AlarmParams(1.01, AlarmComparison.GreaterThanOrEqualToThreshold,
          evaluationPeriods = 3, datapointsToAlarm = 2), DaySecs,
        timeFormat = "%Y-%m-%d")
      val node = app.createData("on_ops_alarm", Seq(alarm("ALARM", "*")),
        Seq(SqlSlot("SELECT '{time}' AS day")))
      app.activate()
      val transitions = app.alarmMonitor().poll()
      val alarmDays = transitions.filter(_.state == Alarms.ALARM)
      require(alarmDays.forall(_.completions.nonEmpty),
        "an ALARM transition did not trigger the downstream node")
      val sp = s
      import sp.implicits._
      alarmDays.map(t => app.load(node("ALARM", t.period.toLocalDate.toString)))
        .foldLeft(Seq.empty[String].toDF("day"))(_ unionAll _)
        .orderBy("day")
    }),

    // ---- composite alarm end-to-end (reference create_composite_alarm):
    // two member alarms over the daily error/view counts (normalized, the
    // m05 scale-invariant shape), composite = errors & NOT views; every
    // composite ALARM onset triggers the downstream node. The oracle
    // replays member states, the rule, and the edge detection in SQL.
    "m09_composite_alarm_trigger" -> ((s, dir) => {
      import graft.app.Application
      import graft.compute.SqlSlot
      val w = s"/tmp/graft_m09_${new java.io.File(dir).getName}" +
        s"_${ProcessHandle.current().pid()}"
      DiagnosticsQueries.cleanupAtExit(w)
      val app = new Application("m09", s, s"$w/app_m09")
      def dailyNorm(typ: String): () => org.apache.spark.sql.DataFrame =
        () => Metrics.evaluate(
            events(s, dir).where(col("event_type") === typ),
            "event_type", "value", "ts", DaySecs, MetricStatistic.SAMPLE_COUNT)
          .withColumn("value", col("value") /
            avg("value").over(org.apache.spark.sql.expressions.Window
              .partitionBy("name")))
      val params = AlarmParams(1.01,
        AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 3, datapointsToAlarm = 2)
      app.createMetricAlarm("m09_err", dailyNorm("error"), params, DaySecs,
        timeFormat = "%Y-%m-%d")
      app.createMetricAlarm("m09_view", dailyNorm("view"), params, DaySecs,
        timeFormat = "%Y-%m-%d")
      import AlarmRule._
      val page = app.createCompositeAlarm("m09_page",
        Ref("m09_err") & ~Ref("m09_view"), timeFormat = "%Y-%m-%d")
      val node = app.createData("on_m09_page", Seq(page("ALARM", "*")),
        Seq(SqlSlot("SELECT '{time}' AS day")))
      app.activate()
      val transitions = app.alarmMonitor().poll()
      val alarmDays = transitions.filter(t =>
        t.alarmId == "m09_page" && t.state == Alarms.ALARM)
      require(alarmDays.forall(_.completions.nonEmpty),
        "a composite ALARM transition did not trigger the downstream node")
      val sp = s
      import sp.implicits._
      alarmDays.map(t => app.load(node("ALARM", t.period.toLocalDate.toString)))
        .foldLeft(Seq.empty[String].toDF("day"))(_ unionAll _)
        .orderBy("day")
    }),

    // ---- M2 weighted: count-weighted statistics (CloudWatch value-count
    // pair semantics — (v, c) is v observed c times). The count column is
    // synthesized deterministically from row content; the oracle replays
    // the SEMANTIC rule by expanding the multiset (one row per count unit)
    // and computing plain statistics over it — so the weighted aggregates
    // are verified against an implementation-independent ground truth.
    "m07_weighted_stats" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("value",
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .withColumn("cnt",
          (length(col("event_type")) + dayofmonth(col("ts"))) % 3 + 1)
      def stat(st: MetricStatistic, alias: String) =
        Metrics.evaluate(ev, "event_type", "value", "ts", DaySecs, st,
          countCol = Some("cnt")).withColumnRenamed("value", alias)
      stat(MetricStatistic.SUM, "wsum")
        .join(stat(MetricStatistic.SAMPLE_COUNT, "wcount"),
          Seq("name", "period_start"))
        .join(stat(MetricStatistic.Percentile(0.5), "wp50"),
          Seq("name", "period_start"))
        .select(col("name"),
          date_format(col("period_start"), "yyyy-MM-dd").as("day"),
          round(col("wsum"), 4).as("wsum"),
          col("wcount").cast("long").as("wcount"),
          round(col("wp50"), 4).as("wp50"))
        .orderBy("name", "day")
    }),

    // ---- M4: composite of two alarms: errors & ~purchases
    "m03_composite_alarm" -> ((s, dir) => {
      val ev = events(s, dir)
      def dailyCount(typ: String) = Metrics.evaluate(
        ev.where(col("event_type") === typ),
        "event_type", "value", "ts", DaySecs, MetricStatistic.SAMPLE_COUNT)
      val params = AlarmParams(45.0,
        AlarmComparison.GreaterThanOrEqualToThreshold, 2, 2)
      val errA = Alarms.evaluate(dailyCount("error"), params, DaySecs)
        .select(col("period_start"), col("state").as("err_state"))
      val viewA = Alarms.evaluate(dailyCount("view"), params, DaySecs)
        .select(col("period_start"), col("state").as("view_state"))
      val joined = errA.join(viewA, "period_start")
      import AlarmRule._
      AlarmRule.evaluate(joined, Ref("err") & ~Ref("view"),
          Map("err" -> "err_state", "view" -> "view_state"))
        .select(date_format(col("period_start"), "yyyy-MM-dd").as("day"),
          col("err_state"), col("view_state"), col("composite_state"))
        .orderBy("day")
    })
  )

  val oracles: Map[String, String] = Map(
    "m01_metric_stats" ->
      """SELECT event_type AS name,
         STRFTIME(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum,
         ROUND(MIN(value), 4) AS min, ROUND(MAX(value), 4) AS max,
         COUNT(value) AS sample_count,
         ROUND(QUANTILE_CONT(CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), 0.5), 4) AS p50
         FROM events GROUP BY 1, 2 ORDER BY name, day""",
    "m02_alarm_eval" ->
      """WITH series AS (
           SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                  CAST(COUNT(*) AS DOUBLE) AS value
           FROM events WHERE event_type = 'error' GROUP BY 1),
         ev AS (
           SELECT d, value,
             SUM(CASE WHEN value >= 45.0 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS br,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS dps
           FROM series)
         SELECT STRFTIME(d, '%Y-%m-%d') AS day, value,
           CASE WHEN dps < 3 THEN 'INSUFFICIENT_DATA'
                WHEN br >= 2 THEN 'ALARM' ELSE 'OK' END AS state
         FROM ev ORDER BY day""",
    "m04_metric_math" ->
      """WITH mk AS (
           SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                  CAST(COUNT(*) AS DOUBLE) AS value
           FROM events WHERE event_type IN ('error', 'view') GROUP BY 1, 2),
         rate AS (
           SELECT e.d, (e.value / v.value) * 100 AS value
           FROM mk e JOIN mk v ON e.d = v.d
           WHERE e.event_type = 'error' AND v.event_type = 'view'),
         ev AS (
           SELECT d, value,
             SUM(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS br,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS dps
           FROM rate)
         SELECT 'error_rate_pct' AS name, STRFTIME(d, '%Y-%m-%d') AS day,
           ROUND(value, 4) AS value,
           CASE WHEN dps < 2 THEN 'INSUFFICIENT_DATA'
                WHEN br >= 1 THEN 'ALARM' ELSE 'OK' END AS state
         FROM ev ORDER BY day""",
    "m05_metric_triggered_alarm" ->
      """WITH counts AS (
           SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                  CAST(COUNT(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'error' GROUP BY 1),
         series AS (SELECT d, v / AVG(v) OVER () AS value FROM counts),
         ev AS (
           SELECT d, value,
             SUM(CASE WHEN value >= 1.01 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS br,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS dps
           FROM series),
         st AS (
           SELECT d, CASE WHEN dps < 3 THEN 'INSUFFICIENT_DATA'
                          WHEN br >= 2 THEN 'ALARM' ELSE 'OK' END AS state
           FROM ev),
         tr AS (SELECT d, state, LAG(state) OVER (ORDER BY d) AS prev FROM st)
         SELECT STRFTIME(d, '%Y-%m-%d') AS day
         FROM tr WHERE state = 'ALARM' AND (prev IS NULL OR prev <> 'ALARM')
         ORDER BY day""",
    "m06_external_metric_alarm" ->
      """WITH counts AS (
           SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                  CAST(COUNT(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         series AS (SELECT d, v / AVG(v) OVER () AS value FROM counts),
         ev AS (
           SELECT d, value,
             SUM(CASE WHEN value >= 1.01 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS br,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS dps
           FROM series),
         st AS (
           SELECT d, CASE WHEN dps < 3 THEN 'INSUFFICIENT_DATA'
                          WHEN br >= 2 THEN 'ALARM' ELSE 'OK' END AS state
           FROM ev),
         tr AS (SELECT d, state, LAG(state) OVER (ORDER BY d) AS prev FROM st)
         SELECT STRFTIME(d, '%Y-%m-%d') AS day
         FROM tr WHERE state = 'ALARM' AND (prev IS NULL OR prev <> 'ALARM')
         ORDER BY day""",
    "m09_composite_alarm_trigger" ->
      """WITH st AS (
           SELECT event_type, d,
             CASE WHEN COUNT(*) OVER w < 3 THEN 'INSUFFICIENT_DATA'
                  WHEN SUM(CASE WHEN value >= 1.01 THEN 1 ELSE 0 END)
                    OVER w >= 2 THEN 'ALARM' ELSE 'OK' END AS state
           FROM (
             SELECT event_type, d, v / AVG(v) OVER (PARTITION BY event_type) AS value
             FROM (SELECT event_type,
                     DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                     CAST(COUNT(*) AS DOUBLE) AS v
                   FROM events WHERE event_type IN ('error', 'view')
                   GROUP BY 1, 2))
           WINDOW w AS (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)),
         comp AS (
           SELECT e.d,
             CASE WHEN e.state = 'ALARM' AND NOT (v.state = 'ALARM')
                  THEN 'ALARM' ELSE 'OK' END AS state
           FROM st e JOIN st v ON e.d = v.d
           WHERE e.event_type = 'error' AND v.event_type = 'view'),
         tr AS (SELECT d, state, LAG(state) OVER (ORDER BY d) AS prev FROM comp)
         SELECT STRFTIME(d, '%Y-%m-%d') AS day
         FROM tr WHERE state = 'ALARM' AND (prev IS NULL OR prev <> 'ALARM')
         ORDER BY day""",
    // identical ground truth to m05 by construction: one emission per
    // error event, SAMPLE_COUNT per day, same normalization and N-of-M
    "m08_internal_metric_alarm" ->
      """WITH counts AS (
           SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                  CAST(COUNT(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'error' GROUP BY 1),
         series AS (SELECT d, v / AVG(v) OVER () AS value FROM counts),
         ev AS (
           SELECT d, value,
             SUM(CASE WHEN value >= 1.01 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS br,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS dps
           FROM series),
         st AS (
           SELECT d, CASE WHEN dps < 3 THEN 'INSUFFICIENT_DATA'
                          WHEN br >= 2 THEN 'ALARM' ELSE 'OK' END AS state
           FROM ev),
         tr AS (SELECT d, state, LAG(state) OVER (ORDER BY d) AS prev FROM st)
         SELECT STRFTIME(d, '%Y-%m-%d') AS day
         FROM tr WHERE state = 'ALARM' AND (prev IS NULL OR prev <> 'ALARM')
         ORDER BY day""",
    "m07_weighted_stats" ->
      """WITH base AS (
           SELECT event_type AS name,
             DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
             CAST(value AS DECIMAL(18,4)) AS v,
             (LENGTH(event_type)
               + EXTRACT(DAY FROM CAST(ts AS TIMESTAMP))) % 3 + 1 AS cnt
           FROM events),
         nums AS (SELECT UNNEST([1, 2, 3]) AS n),
         expanded AS (
           SELECT name, d, v FROM base JOIN nums ON nums.n <= base.cnt)
         SELECT name, STRFTIME(d, '%Y-%m-%d') AS day,
           ROUND(CAST(SUM(v) AS DOUBLE), 4) AS wsum,
           CAST(COUNT(*) AS BIGINT) AS wcount,
           ROUND(QUANTILE_CONT(CAST(v AS DOUBLE), 0.5), 4) AS wp50
         FROM expanded GROUP BY 1, 2 ORDER BY name, day""",
    "m03_composite_alarm" ->
      """WITH mk AS (
           SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                  CAST(COUNT(*) AS DOUBLE) AS value
           FROM events WHERE event_type IN ('error', 'view') GROUP BY 1, 2),
         st AS (
           SELECT event_type, d,
             CASE WHEN COUNT(*) OVER w < 2 THEN 'INSUFFICIENT_DATA'
                  WHEN SUM(CASE WHEN value >= 45.0 THEN 1 ELSE 0 END) OVER w >= 2
                    THEN 'ALARM' ELSE 'OK' END AS state
           FROM mk
           WINDOW w AS (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)),
         j AS (SELECT e.d, e.state AS err_state, v.state AS view_state
               FROM st e JOIN st v ON e.d = v.d
               WHERE e.event_type = 'error' AND v.event_type = 'view')
         SELECT STRFTIME(d, '%Y-%m-%d') AS day, err_state, view_state,
           CASE WHEN err_state = 'ALARM' AND NOT (view_state = 'ALARM')
                THEN 'ALARM' ELSE 'OK' END AS composite_state
         FROM j ORDER BY day"""
  )
}
