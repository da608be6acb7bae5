package graft.diagnostics

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Alarm/metric semantics ported from the reference's alarming tests
  * (test_aws_application_alarming_and_metrics.py shapes): emission, period
  * statistics, N-of-M alarm transitions, missing-data policies, composite
  * algebra. */
class DiagnosticsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")

  test("emit + period statistics (M1/M2)") {
    val diag = new Diagnostics(spark)
    val m = diag("processor")("error_count")
    m.emit(1.0, ts(0)); m.emit(3.0, ts(1)) // period 1
    m.emit(5.0, ts(5))                     // period 2
    m.emit(Seq((2.0, 3L)), ts(11))         // period 3, value-count pair
    val out = Metrics.evaluate(diag.df, "name", "value", "time", 300,
      MetricStatistic.SUM).orderBy("period_start").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(4.0, 5.0, 2.0))
    val avg = Metrics.evaluate(diag.df, "name", "value", "time", 300,
      MetricStatistic.AVG).orderBy("period_start").collect()
    assert(avg.head.getDouble(2) == 2.0)
    // count-weighted (CW value-count semantics): the (2.0, 3) pair is the
    // value 2.0 observed three times
    def weighted(st: MetricStatistic) =
      Metrics.evaluate(diag.df, "name", "value", "time", 300, st,
        countCol = Some("count")).orderBy("period_start").collect()
        .map(_.getDouble(2)).toSeq
    assert(weighted(MetricStatistic.SUM) == Seq(4.0, 5.0, 6.0))
    assert(weighted(MetricStatistic.SAMPLE_COUNT) == Seq(2.0, 1.0, 3.0))
    assert(weighted(MetricStatistic.AVG) == Seq(2.0, 5.0, 2.0))
    assert(weighted(MetricStatistic.Percentile(0.5)) == Seq(2.0, 5.0, 2.0))
    // a zero-count pair (a value observed zero times) contributes to NO
    // weighted statistic — notably not to MIN/MAX extrema
    m.emit(Seq((99.0, 0L)), ts(11))
    assert(weighted(MetricStatistic.MAX) == Seq(3.0, 5.0, 2.0))
    assert(weighted(MetricStatistic.MIN) == Seq(1.0, 5.0, 2.0))
    assert(weighted(MetricStatistic.SUM) == Seq(4.0, 5.0, 6.0))
    assert(weighted(MetricStatistic.SAMPLE_COUNT) == Seq(2.0, 1.0, 3.0))
  }

  test("metric math: expression over aliased series feeds an alarm") {
    val sp = spark
    import sp.implicits._
    val err = Seq((ts(0), 10.0), (ts(5), 50.0), (ts(10), 20.0))
      .toDF("period_start", "value").withColumn("name", lit("err"))
    val total = Seq((ts(0), 100.0), (ts(5), 100.0), (ts(10), 100.0))
      .toDF("period_start", "value").withColumn("name", lit("total"))
    val rate = MetricMath.evaluate(
      Map("e" -> err, "t" -> total), "(e / t) * 100", alias = "rate")
    val rows = rate.orderBy("period_start").collect()
    assert(rows.map(_.getAs[Double]("value")).toSeq == Seq(10.0, 50.0, 20.0))
    assert(rows.forall(_.getAs[String]("name") == "rate"))
    // the derived series alarms like any raw metric
    val st = Alarms.evaluate(rate, AlarmParams(40.0,
      AlarmComparison.GreaterThanOrEqualToThreshold, 1, 1), 300)
      .orderBy("period_start").collect().map(_.getAs[String]("state")).toSeq
    assert(st == Seq(Alarms.OK, Alarms.ALARM, Alarms.OK))
    // inner-join gap semantics: a period missing from one input is absent
    val gappy = MetricMath.evaluate(
      Map("e" -> err.limit(2), "t" -> total), "e + t")
    assert(gappy.count() == 2)
  }

  test("alarm N-of-M transitions (M3)") {
    val sp = spark
    import sp.implicits._
    // values: 3 breaching (>=5), 1 ok, 2 breaching
    val series = Seq(
      ("err", ts(0), 7.0), ("err", ts(5), 9.0), ("err", ts(10), 6.0),
      ("err", ts(15), 1.0), ("err", ts(20), 8.0), ("err", ts(25), 9.0))
      .toDF("name", "period_start", "value")
    val out = Alarms.evaluate(series,
      AlarmParams(5.0, AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 3, datapointsToAlarm = 2), 300)
      .orderBy("period_start").collect().map(_.getString(3)).toSeq
    // windows: [7]=insuff, [7,9]=insuff, [7,9,6]=3/3 ALARM,
    // [9,6,1]=2/3 ALARM, [6,1,8]=2/3 ALARM, [1,8,9]=2/3 ALARM
    assert(out == Seq(Alarms.INSUFFICIENT, Alarms.INSUFFICIENT,
      Alarms.ALARM, Alarms.ALARM, Alarms.ALARM, Alarms.ALARM))
    val strict = Alarms.evaluate(series,
      AlarmParams(5.0, AlarmComparison.GreaterThanOrEqualToThreshold,
        evaluationPeriods = 3, datapointsToAlarm = 3), 300)
      .orderBy("period_start").collect().map(_.getString(3)).toSeq
    assert(strict == Seq(Alarms.INSUFFICIENT, Alarms.INSUFFICIENT,
      Alarms.ALARM, Alarms.OK, Alarms.OK, Alarms.OK))
  }

  test("missing-data policies densify the period grid (M3)") {
    val sp = spark
    import sp.implicits._
    // gap at minute 5
    val series = Seq(("err", ts(0), 9.0), ("err", ts(10), 9.0))
      .toDF("name", "period_start", "value")
    val params = AlarmParams(5.0, AlarmComparison.GreaterThanOrEqualToThreshold,
      evaluationPeriods = 3, datapointsToAlarm = 3,
      missingData = MissingDataPolicy.Breaching)
    val breaching = Alarms.evaluate(series, params, 300)
      .orderBy("period_start").collect()
    assert(breaching.length == 3) // gap filled
    assert(breaching.last.getString(3) == Alarms.ALARM)
    val notBreaching = Alarms.evaluate(series,
      params.copy(missingData = MissingDataPolicy.NotBreaching), 300)
      .orderBy("period_start").collect()
    assert(notBreaching.last.getString(3) == Alarms.OK)
  }

  test("composite alarm algebra (M4): a & (b | ~c)") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (ts(0), "ALARM", "OK", "OK"),
      (ts(5), "ALARM", "ALARM", "ALARM"),
      (ts(10), "OK", "ALARM", "OK"),
      (ts(15), "ALARM", "OK", "ALARM"))
      .toDF("period_start", "a_state", "b_state", "c_state")
    import AlarmRule._
    val rule = Ref("a") & (Ref("b") | ~Ref("c"))
    val out = AlarmRule.evaluate(df, rule,
      Map("a" -> "a_state", "b" -> "b_state", "c" -> "c_state"))
      .orderBy("period_start").collect().map(_.getAs[String]("composite_state")).toSeq
    // t0: A & (OK | ~OK=T) = ALARM; t5: A & (A | F) = ALARM;
    // t10: OK & ... = OK; t15: A & (OK | ~A=F) = OK
    assert(out == Seq("ALARM", "ALARM", "OK", "OK"))
  }

  test("percentile statistic matches interpolated definition") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("m", ts(0), 1.0), ("m", ts(1), 2.0), ("m", ts(2), 3.0),
      ("m", ts(3), 4.0)).toDF("name", "time", "value")
    val p50 = Metrics.evaluate(df, "name", "value", "time", 3600,
      MetricStatistic.Percentile(0.5)).collect().head.getDouble(2)
    assert(p50 == 2.5) // linear interpolation between 2 and 3
  }

  /** DuckDB quantile_cont over the expanded multiset (each value
    * replicated `count` times): sort, pos = p·(N−1), linear interpolate —
    * the reference law the weighted Percentile statistic must satisfy. */
  private def quantileCont(pairs: Seq[(Double, Long)], p: Double): Double = {
    val xs = pairs.flatMap { case (v, n) => Seq.fill(n.toInt)(v) }.sorted
    val pos = p * (xs.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    xs(lo) + (pos - lo) * (xs(hi) - xs(lo))
  }

  private def weightedPnn(pairs: Seq[(Double, Long)], p: Double): Double = {
    val sp = spark
    import sp.implicits._
    val df = pairs.zipWithIndex
      .map { case ((v, n), i) => ("m", ts(i % 59), v, n) }
      .toDF("name", "time", "value", "n")
    Metrics.evaluate(df, "name", "value", "time", 3600,
      MetricStatistic.Percentile(p), countCol = Some("n"))
      .collect().head.getDouble(2)
  }

  test("weighted percentile edges: single pair, zero-count mixed, p0/p100") {
    // single pair: every p collapses to the value, regardless of count
    for (p <- Seq(0.0, 0.25, 0.5, 0.99, 1.0); n <- Seq(1L, 7L))
      assert(weightedPnn(Seq((42.5, n)), p) == 42.5, s"single pair p=$p n=$n")
    // zero-count pairs are values observed ZERO times — they must not
    // move any percentile, including the p0/p100 extremes
    val base = Seq((2.0, 3L), (5.0, 1L), (9.0, 2L))
    val withZeros = Seq((-100.0, 0L)) ++ base ++ Seq((100.0, 0L))
    for (p <- Seq(0.0, 0.1, 0.5, 0.9, 1.0))
      assert(weightedPnn(withZeros, p) == weightedPnn(base, p),
        s"zero-count pair moved p=$p")
    // p0/p100 = weighted min/max (the n>0 extrema)
    assert(weightedPnn(withZeros, 0.0) == 2.0)
    assert(weightedPnn(withZeros, 1.0) == 9.0)
  }

  test("weighted percentile law: equals quantile_cont over the expanded multiset") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 25) {
      val pairs = Seq.fill(1 + rnd.nextInt(6))(
        (math.floor(rnd.nextDouble() * 200 - 100) / 2.0, // half-integer values
          1L + rnd.nextInt(4)))
      val p = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)(rnd.nextInt(6))
      val got = weightedPnn(pairs, p)
      val want = quantileCont(pairs, p)
      assert(math.abs(got - want) < 1e-9,
        s"trial $trial: pairs=$pairs p=$p got=$got want=$want")
    }
    // duplicate VALUES across pairs fold like repeated observations
    assert(weightedPnn(Seq((3.0, 2L), (3.0, 1L), (7.0, 1L)), 0.5) ==
      quantileCont(Seq((3.0, 3L), (7.0, 1L)), 0.5))
  }

  // consumer-scoped prune floor: an alarm with no cursor keeps its OWN
  // evaluation unpruned (full history) until it first advances, while
  // unrelated alarms keep pruning at their own consumers' cursors — a
  // permanently-dead series cannot disable pruning fleet-wide
  test("late-starting alarm: its own rows stay unpruned until its first cursor") {
    val sp = spark
    import sp.implicits._
    def series(vals: (Int, Double)*) =
      vals.map { case (m, v) => ("m", ts(m), v) }
        .toDF("name", "period_start", "value")
    val params = AlarmParams(5.0,
      AlarmComparison.GreaterThanOrEqualToThreshold, 1, 1)
    @volatile var bReady = false
    val a = MetricAlarmDef("a",
      () => series((0, 9.0), (5, 9.0), (10, 9.0)), params, 300)
    // b's store is down for the first poll: no rows, no cursor
    val b = MetricAlarmDef("b",
      () => if (!bReady) sys.error("store down") else series((0, 9.0)),
      params, 300)
    val mon = new AlarmMonitor(Seq(a, b), (_, _, _) => Nil)
    val t1 = mon.poll() // a advances its cursor to minute 10; b fails
    assert(t1.map(_.alarmId) == List("a"))
    bReady = true
    // b's first-ever period (minute 0) is OLDER than a's cursor — the
    // global-min prune floor must not discard it while b has no cursor
    val t2 = mon.poll()
    assert(t2.exists(tr => tr.alarmId == "b" && tr.state == Alarms.ALARM),
      s"b's first transition was pruned away: $t2")
  }
}
