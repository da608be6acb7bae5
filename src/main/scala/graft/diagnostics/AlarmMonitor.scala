package graft.diagnostics

import java.time.LocalDateTime

/** One metric→alarm wiring: a per-period series producer (raw metric
  * statistic or metric-math output — anything shaped
  * (name, period_start, value)) evaluated under `params`, raising state
  * TRANSITIONS into the routing table through `alarm`. */
final case class MetricAlarmDef(
    alarmId: String,
    series: () => org.apache.spark.sql.DataFrame,
    params: AlarmParams,
    periodSecs: Long)

/** The metric→alarm→routing automation (reference chain
  * application.py:826-1005: create_alarm on a metric + the platform's
  * alarm ingestion raising state changes into the processor). The monitor
  * re-evaluates each alarm's series on every [[poll]] and raises ONE event
  * per state transition (CloudWatch semantics: an alarm event fires when
  * the state CHANGES, including the first evaluated period) — steady
  * states never re-fire, so downstream nodes trigger exactly once per
  * OK→ALARM edge.
  *
  * `raise` is the routing injection (Application.raiseAlarm partially
  * applied); the monitor tracks (last period, last state) per alarm so
  * repeated polls over a growing metric store only scan forward.
  */
final class AlarmMonitor(
    defs: Seq[MetricAlarmDef],
    raise: (String, String, Any) => List[String]) {

  final case class Transition(alarmId: String, state: String,
                              period: LocalDateTime,
                              completions: List[String])

  private val lastPeriod = scala.collection.mutable.Map.empty[String, LocalDateTime]
  private val lastState = scala.collection.mutable.Map.empty[String, String]
  private val poller =
    new graft.app.DaemonPoller("graft-alarm-monitor", () => { poll(); () })

  /** Evaluate every alarm over its current series; raise each state
    * transition (in period order) into routing. Returns the raised
    * transitions with the downstream completions each one caused.
    *
    * The cursor (last period/state) advances only AFTER a transition's
    * raise succeeds: if the triggered compute throws, this alarm's scan
    * stops at the failed period and the NEXT poll retries the same
    * transition — a change-only protocol must never silently drop an
    * edge (the state would otherwise have to flip away and back before
    * the downstream ever triggered). */
  def poll(): List[Transition] = synchronized {
    defs.toList.flatMap { d =>
      val rows = Alarms.evaluate(d.series(), d.params, d.periodSecs)
        .select("period_start", "state").orderBy("period_start")
        .collect()
        .map(r => (r.getTimestamp(0).toLocalDateTime, r.getString(1)))
      val fresh = rows.filter { case (t, _) =>
        lastPeriod.get(d.alarmId).forall(t.isAfter) }
      val out = scala.collection.mutable.ListBuffer.empty[Transition]
      var halted = false
      fresh.foreach { case (t, state) =>
        if (!halted) {
          val changed = !lastState.get(d.alarmId).contains(state)
          if (!changed) lastPeriod(d.alarmId) = t
          else {
            try {
              val completions = raise(d.alarmId, state, t)
              lastPeriod(d.alarmId) = t
              lastState(d.alarmId) = state
              out += Transition(d.alarmId, state, t, completions)
            } catch {
              case e: Throwable =>
                System.err.println(s"[graft-alarm-monitor] raise " +
                  s"${d.alarmId}→$state@$t failed (will retry): ${e.getMessage}")
                halted = true // preserve transition order; retry next poll
            }
          }
        }
      }
      out.toList
    }
  }

  /** Background wall-clock poller (daemon; see [[graft.app.DaemonPoller]]
    * for the failure/termination contract — a failing series() read or
    * triggered execution is logged and the loop paces on). */
  def start(pollMillis: Long = 1000): Unit = poller.start(pollMillis)

  def stop(): Unit = poller.stop()
}
