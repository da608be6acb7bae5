package graft.diagnostics

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Metrics + alarming (SURVEY.md §2.a M1-M4), CloudWatch-style semantics
  * re-expressed as Spark windowed aggregations:
  *
  * - M1 emission: `diagnostics("group")("Name").emit(value, ts)` appends to
  *   an in-memory row buffer exposed as a DataFrame (at scale: swap the
  *   buffer for an append-mode parquet sink — the evaluation plan is
  *   identical);
  * - M2 statistic evaluation: `groupBy(window(time, period), name)` with
  *   SUM/AVG/MIN/MAX/SampleCount/pNN (exact interpolated percentile);
  * - M3 alarm evaluation: per-period breach flag, then an M-of-N sliding
  *   frame (`rowsBetween(-(N-1), 0)`) decides ALARM/OK/INSUFFICIENT;
  * - M4 composite alarms: boolean algebra (`&`, `|`, `~`) over per-period
  *   alarm state columns.
  *
  * Reference: metric_alarm_defs.py:14-433, application.py:671-750.
  */
final case class MetricRecord(group: String, name: String, value: Double,
                              count: Long, time: Timestamp)

final class MetricHandle(diag: Diagnostics, group: String, name: String) {
  def emit(value: Double, time: Timestamp): Unit =
    diag.append(MetricRecord(group, name, value, 1L, time))
  /** Value-count pairs form (reference application.py:694-707). */
  def emit(pairs: Seq[(Double, Long)], time: Timestamp): Unit =
    pairs.foreach { case (v, c) => diag.append(MetricRecord(group, name, v, c, time)) }
}

final class MetricGroup(diag: Diagnostics, group: String) {
  def apply(name: String): MetricHandle = new MetricHandle(diag, group, name)
}

final class Diagnostics(spark: SparkSession) {
  private val buf = ArrayBuffer.empty[MetricRecord]
  private[diagnostics] def append(r: MetricRecord): Unit = synchronized { buf += r }
  def apply(group: String): MetricGroup = new MetricGroup(this, group)
  def df: DataFrame = {
    val sp = spark
    import sp.implicits._
    synchronized { buf.toList }.toDF()
  }
}

/** Supported statistics (reference metric_alarm_defs.py:14-133). */
sealed trait MetricStatistic {
  def agg(valueCol: String): Column
  /** Count-weighted form (CloudWatch value-count semantics: a pair
    * (v, c) is the value v observed c times — reference
    * MetricValueCountPairData, metric_alarm_defs.py:184-194, which
    * "adapts AWS CW default behaviour"). Row-wise `agg` is the
    * countCol-of-all-ones special case. */
  def weightedAgg(valueCol: String, countCol: String): Column
}
object MetricStatistic {
  case object SUM extends MetricStatistic {
    def agg(c: String) = sum(col(c))
    def weightedAgg(c: String, n: String) = sum(col(c) * col(n))
  }
  case object AVG extends MetricStatistic {
    def agg(c: String) = avg(col(c))
    // null-value pairs contribute NOTHING — like the row-wise avg,
    // which skips nulls; an unguarded denominator counted their weights
    def weightedAgg(c: String, n: String) =
      sum(col(c) * col(n)) / sum(when(col(c).isNotNull, col(n)))
  }
  case object MIN extends MetricStatistic {
    def agg(c: String) = min(col(c))
    // a zero-count pair is a value observed ZERO times — it must not
    // produce an extremum (SUM/SampleCount already ignore it)
    def weightedAgg(c: String, n: String) = min(when(col(n) > 0, col(c)))
  }
  case object MAX extends MetricStatistic {
    def agg(c: String) = max(col(c))
    def weightedAgg(c: String, n: String) = max(when(col(n) > 0, col(c)))
  }
  case object SAMPLE_COUNT extends MetricStatistic {
    def agg(c: String) = count(col(c))
    def weightedAgg(c: String, n: String) =
      sum(when(col(c).isNotNull, col(n)))
  }
  /** Exact interpolated percentile (matches DuckDB quantile_cont);
    * weighted via the built-in percentile's frequency argument.
    * Identifiers are backtick-quoted like every col()-based statistic —
    * a column named `response time` (or a reserved word) must not be a
    * parse error here alone. */
  final case class Percentile(p: Double) extends MetricStatistic {
    private def q(c: String) = "`" + c.replace("`", "``") + "`"
    def agg(c: String) = expr(s"percentile(${q(c)}, $p)")
    def weightedAgg(c: String, n: String) =
      expr(s"percentile(${q(c)}, $p, cast(${q(n)} as bigint))")
  }
}

object Metrics {

  /** M2: one statistic per (name, tumbling period). Output:
    * (name, period_start timestamp, value double). `countCol` switches
    * to count-weighted statistics (value-count pair emissions — see
    * [[MetricStatistic.weightedAgg]]); without it each row is one
    * observation. */
  def evaluate(metrics: DataFrame, nameCol: String, valueCol: String,
               timeCol: String, periodSecs: Long,
               statistic: MetricStatistic,
               countCol: Option[String] = None): DataFrame =
    metrics
      .groupBy(col(nameCol).as("name"),
        window(col(timeCol), s"$periodSecs seconds").as("w"))
      .agg(countCol.fold(statistic.agg(valueCol))(
          statistic.weightedAgg(valueCol, _))
        .cast("double").as("value"))
      .select(col("name"), col("w.start").as("period_start"), col("value"))

  /** All standard statistics at once (the reference's metric spec surface). */
  def evaluateAll(metrics: DataFrame, nameCol: String, valueCol: String,
                  timeCol: String, periodSecs: Long): DataFrame =
    metrics
      .groupBy(col(nameCol).as("name"),
        window(col(timeCol), s"$periodSecs seconds").as("w"))
      .agg(
        sum(col(valueCol)).cast("double").as("sum"),
        // avg as sum/count: exact (order-independent) when values are
        // decimals, unlike a running double mean
        (sum(col(valueCol)) / count(col(valueCol))).cast("double").as("avg"),
        min(col(valueCol)).cast("double").as("min"),
        max(col(valueCol)).cast("double").as("max"),
        count(col(valueCol)).as("sample_count"),
        expr(s"percentile(`${valueCol.replace("`", "``")}`, 0.5)")
          .cast("double").as("p50"))
      .select(col("name"), col("w.start").as("period_start"),
        col("sum"), col("avg"), col("min"), col("max"),
        col("sample_count"), col("p50"))
}

/** Metric math (reference MetricExpression, metric_alarm_defs.py:162-174):
  * arithmetic over aliased per-period metric series, producing a derived
  * series that feeds [[Alarms.evaluate]] like any raw metric — the
  * CloudWatch metric-math analog. The expression is Spark SQL over the
  * alias columns (e.g. `"(err / total) * 100"`), so it rides Catalyst
  * codegen; series are aligned on period_start (inner join: a period
  * missing from any input is missing from the result, the reference's
  * gap semantics). */
object MetricMath {
  /** Reference MetricExpression.DEFAULT_ALIAS. */
  val DefaultAlias = "if_target_metric_expression"

  def evaluate(series: Map[String, DataFrame], expression: String,
               alias: String = DefaultAlias): DataFrame = {
    require(series.nonEmpty, "metric math needs at least one input series")
    val joined = series.toSeq.sortBy(_._1).map { case (a, df) =>
      df.select(col("period_start"), col("value").as(a))
    }.reduce(_.join(_, Seq("period_start")))
    joined.select(lit(alias).as("name"), col("period_start"),
      expr(expression).cast("double").as("value"))
  }
}

/** Comparison operators (reference metric_alarm_defs.py:271-329). */
sealed trait AlarmComparison { def breaches(v: Column, threshold: Double): Column }
object AlarmComparison {
  case object GreaterThanOrEqualToThreshold extends AlarmComparison {
    def breaches(v: Column, t: Double) = v >= t }
  case object GreaterThanThreshold extends AlarmComparison {
    def breaches(v: Column, t: Double) = v > t }
  case object LessThanThreshold extends AlarmComparison {
    def breaches(v: Column, t: Double) = v < t }
  case object LessThanOrEqualToThreshold extends AlarmComparison {
    def breaches(v: Column, t: Double) = v <= t }
}

/** Missing-data treatment (CloudWatch semantics). */
sealed trait MissingDataPolicy
object MissingDataPolicy {
  case object Breaching extends MissingDataPolicy
  case object NotBreaching extends MissingDataPolicy
  case object Missing extends MissingDataPolicy // period simply absent
}

final case class AlarmParams(
    threshold: Double,
    comparison: AlarmComparison,
    evaluationPeriods: Int,
    datapointsToAlarm: Int,
    missingData: MissingDataPolicy = MissingDataPolicy.Missing) {
  // CloudWatch's own validation (1 <= M <= N): M=0 is permanent ALARM,
  // M>N silently unreachable, N=0 an opaque window-frame error at
  // analysis — all three must fail HERE, where the misconfiguration is
  require(evaluationPeriods >= 1,
    s"evaluationPeriods must be >= 1, got $evaluationPeriods")
  require(datapointsToAlarm >= 1 && datapointsToAlarm <= evaluationPeriods,
    s"datapointsToAlarm must be in [1, evaluationPeriods=" +
      s"$evaluationPeriods], got $datapointsToAlarm")
}

object Alarms {
  val ALARM = "ALARM"
  val OK = "OK"
  val INSUFFICIENT = "INSUFFICIENT_DATA"

  /** M3: N-of-M evaluation over a per-period metric series
    * (name, period_start, value): a period is ALARM when >= datapointsToAlarm
    * of the trailing evaluationPeriods datapoints breach; INSUFFICIENT until
    * a full window exists (unless the missing-data policy fills it). */
  def evaluate(series: DataFrame, params: AlarmParams,
               periodSecs: Long): DataFrame = {
    val n = params.evaluationPeriods
    val filled = params.missingData match {
      case MissingDataPolicy.Missing => series
      case policy =>
        // densify the period grid per name, fill gaps per policy. The
        // fill sentinel must land on the breaching/non-breaching side
        // of the threshold at ANY magnitude: a fixed ±offset rounds
        // back to the threshold once |threshold| outgrows the offset's
        // half-ulp (≥ ~5e24 for 1e9), inverting the policy — use the
        // double extremes instead.
        val fillVal = policy match {
          case MissingDataPolicy.Breaching =>
            params.comparison match {
              case AlarmComparison.LessThanThreshold
                   | AlarmComparison.LessThanOrEqualToThreshold =>
                -Double.MaxValue
              case _ => Double.MaxValue
            }
          case _ =>
            params.comparison match {
              case AlarmComparison.LessThanThreshold
                   | AlarmComparison.LessThanOrEqualToThreshold =>
                Double.MaxValue
              case _ => -Double.MaxValue
            }
        }
        val grid = series.groupBy("name")
          .agg(min("period_start").as("lo"), max("period_start").as("hi"))
          .select(col("name"), explode(sequence(col("lo"), col("hi"),
            expr(s"INTERVAL $periodSecs SECONDS"))).as("period_start"))
        grid.join(series, Seq("name", "period_start"), "left")
          .withColumn("value", coalesce(col("value"), lit(fillVal)))
    }
    val w = Window.partitionBy("name").orderBy("period_start")
      .rowsBetween(-(n - 1), Window.currentRow)
    filled
      .withColumn("__breach",
        when(params.comparison.breaches(col("value"), params.threshold), 1)
          .otherwise(0))
      .withColumn("__breaches", sum(col("__breach")).over(w))
      .withColumn("__dps", count(col("__breach")).over(w))
      .select(col("name"), col("period_start"), col("value"),
        when(col("__dps") < n, lit(INSUFFICIENT))
          .when(col("__breaches") >= params.datapointsToAlarm, lit(ALARM))
          .otherwise(lit(OK)).as("state"))
  }
}

/** M4: composite alarm rule trees over per-period state columns:
  * `Ref("a") & (Ref("b") | ~Ref("c"))`. `toColumn` maps alarm id ->
  * its state Column ("ALARM"/"OK"/...); composite state is ALARM where the
  * boolean tree holds. Reference: metric_alarm_defs.py:330-433. */
sealed trait AlarmRule {
  def &(other: AlarmRule): AlarmRule = AlarmRule.And(this, other)
  def |(other: AlarmRule): AlarmRule = AlarmRule.Or(this, other)
  def unary_~ : AlarmRule = AlarmRule.Not(this)
  def toColumn(stateOf: String => Column): Column
}
object AlarmRule {
  /** True when the referenced alarm is in `targetState`. */
  final case class Ref(alarmId: String, targetState: String = Alarms.ALARM)
      extends AlarmRule {
    def toColumn(stateOf: String => Column): Column =
      stateOf(alarmId) === targetState
  }
  final case class And(l: AlarmRule, r: AlarmRule) extends AlarmRule {
    def toColumn(s: String => Column): Column = l.toColumn(s) && r.toColumn(s)
  }
  final case class Or(l: AlarmRule, r: AlarmRule) extends AlarmRule {
    def toColumn(s: String => Column): Column = l.toColumn(s) || r.toColumn(s)
  }
  final case class Not(r: AlarmRule) extends AlarmRule {
    def toColumn(s: String => Column): Column = !r.toColumn(s)
  }

  /** Evaluate a composite over joined per-alarm state columns: `states` maps
    * alarm id -> (period-keyed) state column name in `df`. */
  def evaluate(df: DataFrame, rule: AlarmRule,
               states: Map[String, String]): DataFrame =
    df.withColumn("composite_state",
      when(rule.toColumn(id => col(states(id))), Alarms.ALARM)
        .otherwise(Alarms.OK))

  /** Every alarm id the rule references. */
  def refs(rule: AlarmRule): Set[String] = rule match {
    case Ref(id, _) => Set(id)
    case And(l, r) => refs(l) ++ refs(r)
    case Or(l, r) => refs(l) ++ refs(r)
    case Not(r) => refs(r)
  }

  /** Driver-side rule evaluation over one period's member states — the
    * scalar twin of [[evaluate]] (same semantics, no DataFrame). */
  def holds(rule: AlarmRule, stateOf: String => String): Boolean = rule match {
    case Ref(id, target) => stateOf(id) == target
    case And(l, r) => holds(l, stateOf) && holds(r, stateOf)
    case Or(l, r) => holds(l, stateOf) || holds(r, stateOf)
    case Not(r) => !holds(r, stateOf)
  }
}
