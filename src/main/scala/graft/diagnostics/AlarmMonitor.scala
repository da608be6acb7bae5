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

/** One composite wiring (reference create_composite_alarm,
  * application.py:937-1005): the member alarms' per-period states join on
  * period (inner join — a period a member hasn't evaluated yet is
  * absent, the metric-math gap semantics) and the [[AlarmRule]] algebra
  * decides the composite state; its TRANSITIONS raise like any alarm's.
  * Members are referenced by alarm id and may themselves be composites
  * declared EARLIER (declaration order is the evaluation order). */
final case class CompositeAlarmDef(
    alarmId: String,
    memberIds: Seq[String],
    rule: AlarmRule) {
  // fail at CONSTRUCTION, with the alarm named — a rule referencing an
  // unknown member would otherwise surface as a bare
  // NoSuchElementException inside every poll (and, unisolated, starve
  // the whole monitor)
  require(memberIds.nonEmpty,
    s"composite alarm '$alarmId' needs at least one member")
  require(AlarmRule.refs(rule).subsetOf(memberIds.toSet),
    s"composite alarm '$alarmId': rule references " +
      s"${(AlarmRule.refs(rule) -- memberIds).mkString(", ")} " +
      "outside its declared members")
}

object CompositeAlarmDef {
  /** Derive the composite's (period, state) rows from its members'
    * ALREADY-EVALUATED rows — pure driver-side arithmetic, no second
    * series() read (a member's series may be cursor-backed, so
    * re-invoking it mid-poll would see advanced state). */
  def deriveRows(c: CompositeAlarmDef,
                 memberRows: Map[String, Seq[(LocalDateTime, String)]])
      : Seq[(LocalDateTime, String)] = {
    val maps = c.memberIds.map(id => id -> memberRows(id).toMap).toMap
    val common = c.memberIds.map(id => memberRows(id).map(_._1).toSet)
      .reduce(_ intersect _)
    common.toSeq.sortWith(_.compareTo(_) < 0).map { t =>
      (t, if (AlarmRule.holds(c.rule, id => maps(id)(t))) Alarms.ALARM
          else Alarms.OK)
    }
  }
}

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
    raise: (String, String, Any) => List[String],
    composites: Seq[CompositeAlarmDef] = Nil,
    onCursor: (String, LocalDateTime) => Unit = (_, _) => ()) {

  final case class Transition(alarmId: String, state: String,
                              period: LocalDateTime,
                              completions: List[String])

  private val lastPeriod = scala.collection.mutable.Map.empty[String, LocalDateTime]
  private val lastState = scala.collection.mutable.Map.empty[String, String]
  private val poller =
    new graft.app.DaemonPoller("graft-alarm-monitor", () => { poll(); () })

  /** Advance one alarm's transition cursor over its (period, state) rows.
    *
    * The cursor (last period/state) advances only AFTER a transition's
    * raise succeeds: if the triggered compute throws, this alarm's scan
    * stops at the failed period and the NEXT poll retries the same
    * transition — a change-only protocol must never silently drop an
    * edge (the state would otherwise have to flip away and back before
    * the downstream ever triggered). The retry contract requires the
    * failed period's row to REAPPEAR on the next poll, so every cursor
    * advance is reported through `onCursor`: a cursor-backed series
    * (externalMetricSeries with a partition frontier) anchors its read
    * window to this consumed position rather than its own last read —
    * otherwise a long raise-failure streak while new partitions land
    * would push the failed period out of the lookback window and
    * silently drop the pending transition. */
  private def advance(alarmId: String,
                      rows: Seq[(LocalDateTime, String)]): List[Transition] = {
    val fresh = rows.filter { case (t, s) =>
      lastPeriod.get(alarmId) match {
        case None => true
        case Some(lp) =>
          // strictly-newer periods always; the ALREADY-CONSUMED period
          // re-enters only when late intra-period data FLIPPED its
          // evaluated state — a change-only protocol must raise the
          // corrected edge, not silently keep the stale one (the
          // newest period is typically still OPEN when first seen)
          t.isAfter(lp) ||
            (t == lp && !lastState.get(alarmId).contains(s))
      }
    }
    val out = scala.collection.mutable.ListBuffer.empty[Transition]
    var halted = false
    def consume(t: LocalDateTime): Unit = {
      lastPeriod(alarmId) = t
      onCursor(alarmId, t)
    }
    fresh.foreach { case (t, state) =>
      if (!halted) {
        val changed = !lastState.get(alarmId).contains(state)
        if (!changed) consume(t)
        else {
          try {
            val completions = raise(alarmId, state, t)
            consume(t)
            lastState(alarmId) = state
            out += Transition(alarmId, state, t, completions)
          } catch {
            // NonFatal: an OOM/StackOverflow must not be absorbed as a
            // retryable raise failure, and interruption must propagate
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[graft-alarm-monitor] raise " +
                s"$alarmId→$state@$t failed (will retry): ${e.getMessage}")
              halted = true // preserve transition order; retry next poll
          }
        }
      }
    }
    out.toList
  }

  /** Fixpoint over composite membership: the consumers of an alarm's
    * evaluated rows are the alarm itself plus every composite
    * (transitively) built on it — deriveRows reads member rows, so a
    * lagging composite cursor means member periods older than the
    * member's own cursor are still needed. */
  private def consumersOf(alarmId: String): Set[String] = {
    var consumers = Set(alarmId)
    var grew = true
    while (grew) {
      val next = consumers ++ composites
        .filter(_.memberIds.exists(consumers)).map(_.alarmId)
      grew = next.size != consumers.size
      consumers = next
    }
    consumers
  }

  private def stateRows(d: MetricAlarmDef): Seq[(LocalDateTime, String)] = {
    val evaluated = Alarms.evaluate(d.series(), d.params, d.periodSecs)
      .select("period_start", "state")
    // bound the driver transfer: advance() discards everything before
    // its cursor, so only periods at/after the most-behind CONSUMER of
    // THIS alarm's rows matter (itself + composites transitively built
    // on it). A consumer with no cursor yet needs the full history —
    // no pruning for this alarm until it advances — but unrelated
    // alarms never couple in: a permanently-dead series elsewhere
    // leaves only ITS OWN (empty) evaluation unpruned instead of
    // disabling pruning fleet-wide and re-growing the full-history
    // collect() this floor exists to prevent.
    val floor = synchronized {
      val need = consumersOf(d.alarmId)
      if (need.exists(id => !lastPeriod.contains(id))) None
      else Some(need.toSeq.map(lastPeriod).min(Ordering.fromLessThan[
        LocalDateTime]((a, b) => a.isBefore(b))))
    }
    val pruned = floor match {
      case Some(f) => evaluated.where(org.apache.spark.sql.functions
        .col("period_start") >= java.sql.Timestamp.valueOf(f))
      case None => evaluated
    }
    pruned.orderBy("period_start")
      .collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime, r.getString(1))).toSeq
  }

  /** Evaluate every alarm over its current series; raise each state
    * transition (in period order) into routing. Returns the raised
    * transitions with the downstream completions each one caused.
    *
    * Each member series is read ONCE per poll: composites derive from
    * the same rows their members were judged on (one snapshot — a
    * member edge and the composite edge it causes raise together, and
    * cursor-backed series are not advanced twice). Composites evaluate
    * in declaration order, so an earlier composite can be a member of a
    * later one. */
  def poll(): List[Transition] = synchronized {
    val rowsById = scala.collection.mutable.Map.empty[
      String, Seq[(LocalDateTime, String)]]
    // PER-ALARM fault isolation: one alarm's failing series() (deleted
    // external store, broken schema) must not abort the poll before
    // any other alarm advances — unisolated, a permanently-broken
    // series starves every healthy alarm forever
    defs.foreach { d =>
      try rowsById(d.alarmId) = stateRows(d)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft-alarm-monitor] series for " +
            s"'${d.alarmId}' failed this poll (others continue): " +
            s"${e.getClass.getName}: ${e.getMessage}")
      }
    }
    val simple = defs.toList
      .filter(d => rowsById.contains(d.alarmId))
      .flatMap(d => advance(d.alarmId, rowsById(d.alarmId)))
    val composite = composites.toList.flatMap { c =>
      if (!c.memberIds.forall(rowsById.contains)) {
        System.err.println(s"[graft-alarm-monitor] composite " +
          s"'${c.alarmId}' skipped this poll — member series " +
          s"${c.memberIds.filterNot(rowsById.contains).mkString(", ")} " +
          "unavailable")
        Nil
      } else {
        val rows = CompositeAlarmDef.deriveRows(c, rowsById.toMap)
        rowsById(c.alarmId) = rows // visible to later composites
        advance(c.alarmId, rows)
      }
    }
    simple ++ composite
  }

  /** Background wall-clock poller (daemon; see [[graft.app.DaemonPoller]]
    * for the failure/termination contract — a failing series() read or
    * triggered execution is logged and the loop paces on). */
  def start(pollMillis: Long = 1000): Unit = poller.start(pollMillis)

  def stop(): Unit = poller.stop()
}
