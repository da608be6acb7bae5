package graft.app

import java.time.{Duration, Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit

/** Timer schedule expressions (T1). The reference delegates parsing to the
  * platform's scheduled-event service, accepting `rate(...)` and AWS-style
  * 6-field `cron(...)` strings (application.py:1023-1052 passes the
  * expression through; signal_source.py:1103-1160 carries it on the timer
  * source spec). Here the engine owns the parse + next-fire computation so
  * a driver-local scheduler can fire timer signals into the routing table.
  *
  * Supported:
  *   - `rate(N minute|minutes|hour|hours|day|days)`
  *   - `cron(min hour dom month dow [year])` — 5- or 6-field, UTC, with
  *     `*`, `?`, lists `,`, ranges `-`, steps `/`, month names JAN-DEC,
  *     day names SUN-SAT; day-of-week numbering is AWS's 1=SUN..7=SAT.
  *     One of dom/dow must be unrestricted (`*`/`?`), as AWS requires.
  *   - calendar tokens `L`/`W`/`#` are NOT supported → parse error.
  */
sealed trait Schedule {
  /** The first fire time STRICTLY AFTER `after` (UTC). */
  def nextFire(after: Instant): Instant
}

object Schedule {

  /** Fixed-period schedule anchored at `anchor` (fires at anchor + k·period;
    * the reference's rate() anchors at rule-creation time — pass the
    * activation instant for the same behavior). */
  final case class Rate(period: Duration, anchor: Instant = Instant.EPOCH)
      extends Schedule {
    require(!period.isZero && !period.isNegative, s"rate period must be positive")
    def nextFire(after: Instant): Instant = {
      if (after.isBefore(anchor)) return anchor
      val k = Duration.between(anchor, after).toMillis / period.toMillis
      var n = anchor.plus(period.multipliedBy(k))
      while (!n.isAfter(after)) n = n.plus(period)
      n
    }
  }

  /** Cron schedule; `None` field = unrestricted (`*`/`?`). `dows` uses
    * AWS numbering (1=SUN..7=SAT) converted at match time. */
  final case class Cron(minutes: Set[Int], hours: Set[Int],
                        doms: Option[Set[Int]], months: Set[Int],
                        dows: Option[Set[Int]], years: Option[Set[Int]])
      extends Schedule {

    private def dayMatches(d: LocalDate): Boolean = {
      val domOk = doms.forall(_.contains(d.getDayOfMonth))
      // java MONDAY=1..SUNDAY=7 → AWS SUN=1..SAT=7
      val awsDow = d.getDayOfWeek.getValue % 7 + 1
      val dowOk = dows.forall(_.contains(awsDow))
      domOk && dowOk
    }

    def nextFire(after: Instant): Instant = {
      val minsSorted = minutes.toList.sorted
      val hoursSorted = hours.toList.sorted
      var t = LocalDateTime.ofInstant(after, ZoneOffset.UTC)
        .truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      // search horizon: through the last pinned year when one exists
      // (e.g. `cron(... 2040)` declared years ahead), else 8 years —
      // covering the rarest leap-day + dow coincidence
      // (Feb-29-on-a-Monday ≈ 7y gap). Day-walking is cheap: even the
      // 2199 year cap is only ~63k iterations.
      val limit = years.map(_.max) match {
        case Some(y) => LocalDate.of(y, 12, 31)
        case None => t.plusYears(8).toLocalDate
      }
      var day = t.toLocalDate
      var first = true
      while (!day.isAfter(limit)) {
        val yearOk = years.forall(_.contains(day.getYear))
        if (yearOk && months.contains(day.getMonthValue) && dayMatches(day)) {
          val (h0, m0) = if (first) (t.getHour, t.getMinute) else (0, 0)
          for (h <- hoursSorted if h >= h0; m <- minsSorted) {
            if (h > h0 || m >= m0)
              return day.atTime(h, m).toInstant(ZoneOffset.UTC)
          }
        }
        day = day.plusDays(1)
        first = false
      }
      throw new IllegalStateException(
        s"no fire time on or before $limit (after $after) for $this")
    }
  }

  private val monthNames = List("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC").zipWithIndex
    .map { case (n, i) => n -> (i + 1) }.toMap
  private val dayNames = List("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")
    .zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap

  private def parseField(field: String, lo: Int, hi: Int,
                         names: Map[String, Int]): Option[Set[Int]] = {
    if (field == "*" || field == "?") return None
    def atom(s: String): Int = {
      val up = s.toUpperCase
      names.getOrElse(up,
        try s.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(s"unsupported cron token '$s'") })
    }
    val out = field.split(",").toList.flatMap { term =>
      val (rangePart, step) = term.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron term '$term'")
      }
      require(step >= 1, s"bad cron step in '$term'")
      val (from, to) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-", 2); (atom(a), atom(b))
        // `a/s` (no dash) means a..max per AWS
        case r if step > 1 || term.contains("/") => (atom(r), hi)
        case r => val v = atom(r); (v, v)
      }
      require(from >= lo && to <= hi && from <= to,
        s"cron term '$term' out of range [$lo,$hi]")
      (from to to by step).toList
    }
    Some(out.toSet)
  }

  private val RatePattern =
    """(?i)rate\(\s*(\d+)\s+(minute|minutes|hour|hours|day|days)\s*\)""".r
  private val CronPattern = """(?i)cron\(\s*(.+?)\s*\)""".r

  /** Parse a reference-style schedule expression; anchor applies to
    * rate() schedules only. */
  def parse(expr: String, rateAnchor: Instant = Instant.EPOCH): Schedule =
    expr.trim match {
      case RatePattern(n, unit) =>
        val d = unit.toLowerCase match {
          case u if u.startsWith("minute") => Duration.ofMinutes(n.toLong)
          case u if u.startsWith("hour") => Duration.ofHours(n.toLong)
          case _ => Duration.ofDays(n.toLong)
        }
        Rate(d, rateAnchor)
      case CronPattern(body) =>
        val f = body.trim.split("\\s+")
        require(f.length == 5 || f.length == 6,
          s"cron needs 5 or 6 fields, got ${f.length} in '$expr'")
        // calendar tokens L/W/# are rejected by the atom parser below
        // ("unsupported cron token") — they never parse as names or ints
        val minutes = parseField(f(0), 0, 59, Map.empty).getOrElse((0 to 59).toSet)
        val hours = parseField(f(1), 0, 23, Map.empty).getOrElse((0 to 23).toSet)
        val doms = parseField(f(2), 1, 31, Map.empty)
        val months = parseField(f(3), 1, 12, monthNames).getOrElse((1 to 12).toSet)
        val dows = parseField(f(4), 1, 7, dayNames)
        val years = if (f.length == 6) parseField(f(5), 1970, 2199, Map.empty) else None
        require(doms.isEmpty || dows.isEmpty,
          s"one of day-of-month/day-of-week must be '*' or '?' in '$expr'")
        Cron(minutes, hours, doms, months, dows, years)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported schedule expression '$other' (expected rate(...) or cron(...))")
    }
}

/** Driver-side timer scheduler: tracks the next fire time per scheduled
  * timer and fires due timer signals into the application's routing table
  * (the in-proc analog of the reference's scheduled-event rule → processor
  * ingestion path). Clock injection via [[advanceTo]] keeps tests
  * deterministic; [[start]] polls the wall clock for production use.
  *
  * Catch-up semantics: EVERY missed tick fires, in chronological order
  * across timers — a driver that slept through three midnights owes its
  * routes three day partitions, not one.
  */
final class TimerScheduler private[app] (
    app: Application,
    entries: Seq[(NodeRef, Schedule)],
    startAt: Instant) {

  // an EXHAUSTED schedule (pinned-year cron fully in the past) maps to
  // Instant.MAX — never selected as due — instead of throwing here or
  // in advanceTo, where it would wedge the poll loop and starve every
  // other timer
  private def nextOrNever(s: Schedule, from: Instant): Instant =
    try s.nextFire(from)
    catch {
      case e: IllegalStateException =>
        System.err.println(s"[graft-timer-scheduler] schedule exhausted " +
          s"(${e.getMessage}) — timer disabled")
        Instant.MAX
    }

  private val next = scala.collection.mutable.Map[Int, Instant](
    entries.indices.map(i => i -> nextOrNever(entries(i)._2, startAt)): _*)
  private val poller =
    new DaemonPoller("graft-timer-scheduler", () => { advanceTo(Instant.now()); () })

  def nextFireTimes: Map[String, Instant] =
    synchronized { next.map { case (i, t) => entries(i)._1.signal.alias -> t }.toMap }

  /** Fire every schedule due at or before `now`; returns (timerId,
    * fireTime) in fire order. The fired dimension value is the scheduled
    * fire time (UTC LocalDateTime), truncated by the timer dimension's
    * own format at materialization.
    *
    * A tick whose downstream compute THROWS still counts as fired — the
    * timer event was delivered into routing before the compute ran — so
    * its next-fire time advances and the loop continues with the other
    * due ticks. Anything else would hot-retry the same failing tick
    * forever and starve every other timer. Redeem a failed tick's
    * outputs with manual execute/backfill. */
  def advanceTo(now: Instant): List[(String, Instant)] = synchronized {
    val fired = scala.collection.mutable.ListBuffer.empty[(String, Instant)]
    var due = true
    while (due) {
      val candidates = next.filter { case (_, t) => !t.isAfter(now) }
      if (candidates.isEmpty) due = false
      else {
        val (i, t) = candidates.minBy(_._2)
        val (timer, schedule) = entries(i)
        next(i) = nextOrNever(schedule, t) // advance FIRST: a failed compute
        fired += ((timer.signal.alias, t)) // must not wedge the schedule
        try app.fireTimer(timer, LocalDateTime.ofInstant(t, ZoneOffset.UTC))
        catch {
          case e: Throwable => System.err.println(
            s"[graft-timer-scheduler] ${timer.signal.alias}@$t compute failed: ${e.getMessage}")
        }
      }
    }
    fired.toList
  }

  /** Background wall-clock poller (daemon; see [[DaemonPoller]] for the
    * failure/termination contract — fire failures are additionally
    * contained per tick inside [[advanceTo]]). */
  def start(pollMillis: Long = 1000): Unit = poller.start(pollMillis)

  def stop(): Unit = poller.stop()
}
