package graft.app

import java.time.{Duration, Instant}
import org.scalatest.funsuite.AnyFunSuite

/** Schedule-expression parse + next-fire-time semantics (T1; reference
  * passes cron()/rate() through to the platform's scheduled-event rules,
  * application.py:1023-1052 / signal_source.py:1103-1160 — the engine owns
  * the calendar math here). */
class ScheduleSuite extends AnyFunSuite {

  private def at(s: String): Instant = Instant.parse(s)

  test("rate(): anchored multiples, strictly after") {
    val r = Schedule.parse("rate(5 minutes)")
    assert(r == Schedule.Rate(Duration.ofMinutes(5)))
    assert(r.nextFire(at("2026-08-12T10:02:13Z")) == at("2026-08-12T10:05:00Z"))
    // exactly on a boundary → NEXT period (strictly after)
    assert(r.nextFire(at("2026-08-12T10:05:00Z")) == at("2026-08-12T10:10:00Z"))
    val daily = Schedule.parse("rate(1 day)")
    assert(daily.nextFire(at("2026-08-12T03:00:00Z")) == at("2026-08-13T00:00:00Z"))
    // custom anchor (reference rate() anchors at rule creation)
    val anchored = Schedule.parse("rate(1 hour)", rateAnchor = at("2026-08-12T10:30:00Z"))
    assert(anchored.nextFire(at("2026-08-12T11:00:00Z")) == at("2026-08-12T11:30:00Z"))
    assert(anchored.nextFire(at("2026-08-12T09:00:00Z")) == at("2026-08-12T10:30:00Z"))
  }

  test("cron: daily fixed time") {
    val c = Schedule.parse("cron(0 12 * * ? *)")
    assert(c.nextFire(at("2026-08-12T11:59:00Z")) == at("2026-08-12T12:00:00Z"))
    // on the boundary → tomorrow (strictly after)
    assert(c.nextFire(at("2026-08-12T12:00:00Z")) == at("2026-08-13T12:00:00Z"))
    assert(c.nextFire(at("2026-08-12T12:00:01Z")) == at("2026-08-13T12:00:00Z"))
  }

  test("cron: day-of-week (AWS numbering 1=SUN..7=SAT, names)") {
    // 2026-08-12 is a Wednesday; 2=MON → next Monday is 2026-08-17
    val mon = Schedule.parse("cron(15 10 ? * 2 *)")
    assert(mon.nextFire(at("2026-08-12T00:00:00Z")) == at("2026-08-17T10:15:00Z"))
    val weekdays = Schedule.parse("cron(0 9 ? * MON-FRI *)")
    // Friday evening → Monday morning
    assert(weekdays.nextFire(at("2026-08-14T10:00:00Z")) == at("2026-08-17T09:00:00Z"))
    // Sunday → Monday
    assert(weekdays.nextFire(at("2026-08-16T00:00:00Z")) == at("2026-08-17T09:00:00Z"))
  }

  test("cron: steps, lists, ranges") {
    val q = Schedule.parse("cron(0/15 * * * ? *)")
    assert(q.nextFire(at("2026-08-12T10:07:00Z")) == at("2026-08-12T10:15:00Z"))
    assert(q.nextFire(at("2026-08-12T10:46:00Z")) == at("2026-08-12T11:00:00Z"))
    val lst = Schedule.parse("cron(5,35 8-10 * * ? *)")
    assert(lst.nextFire(at("2026-08-12T08:36:00Z")) == at("2026-08-12T09:05:00Z"))
    assert(lst.nextFire(at("2026-08-12T10:36:00Z")) == at("2026-08-13T08:05:00Z"))
  }

  test("cron: month names, day-of-month, year field, leap day") {
    val jul1 = Schedule.parse("cron(0 0 1 JAN,JUL ? *)")
    assert(jul1.nextFire(at("2026-08-12T00:00:00Z")) == at("2027-01-01T00:00:00Z"))
    assert(jul1.nextFire(at("2027-03-01T00:00:00Z")) == at("2027-07-01T00:00:00Z"))
    // Feb 29 only exists in leap years — the walk skips to 2028
    val leap = Schedule.parse("cron(0 0 29 2 ? *)")
    assert(leap.nextFire(at("2026-08-12T00:00:00Z")) == at("2028-02-29T00:00:00Z"))
    // pinned year
    val pinned = Schedule.parse("cron(30 6 15 3 ? 2027)")
    assert(pinned.nextFire(at("2026-08-12T00:00:00Z")) == at("2027-03-15T06:30:00Z"))
  }

  test("cron: 5-field form accepted (year defaults to *)") {
    val c = Schedule.parse("cron(0 0 * * ?)")
    assert(c.nextFire(at("2026-08-12T05:00:00Z")) == at("2026-08-13T00:00:00Z"))
  }

  test("exhausted pinned-year cron disables the timer, never wedges the loop") {
    // a cron pinned to a past year throws from nextFire; the scheduler
    // must disable that ONE timer and keep serving the others — both at
    // construction (already exhausted) and when it exhausts mid-flight
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    try {
      val work = java.nio.file.Files.createTempDirectory("graft_sched_ex").toString
      val app = new Application("schedex", spark, work)
      app.createTimer("dead", scheduleExpression = "cron(0 12 * * ? 2020)")
      app.createTimer("alive", scheduleExpression = "cron(0 0 * * ? *)")
      val hook = new java.util.concurrent.atomic.AtomicInteger()
      app.createData("tick", Seq(app.getTimer("alive").get),
        Seq(graft.compute.InlinedSlot(_ => { hook.incrementAndGet(); () })))
      app.activate()
      // construction at 2026: "dead" is already exhausted — no throw
      val sched = app.scheduler(at("2026-08-12T23:00:00Z"))
      val fired = sched.advanceTo(at("2026-08-14T00:30:00Z"))
      assert(fired.map(_._1).distinct == List("alive"),
        s"only the live timer fires: $fired")
      assert(fired.length == 2) // two midnights owed
      assert(sched.nextFireTimes("dead") == Instant.MAX)
    } finally spark.stop()
  }

  test("invalid expressions throw") {
    intercept[IllegalArgumentException](Schedule.parse("every 5 minutes"))
    intercept[IllegalArgumentException](Schedule.parse("cron(0 0)"))
    // both dom and dow restricted (AWS requires one to be ? / *)
    intercept[IllegalArgumentException](Schedule.parse("cron(0 0 1 * 2 *)"))
    // calendar tokens unsupported
    intercept[IllegalArgumentException](Schedule.parse("cron(0 0 L * ? *)"))
    intercept[IllegalArgumentException](Schedule.parse("cron(0 0 ? * 2#3 *)"))
    // out of range
    intercept[IllegalArgumentException](Schedule.parse("cron(61 0 * * ? *)"))
    // a schedule that can never fire within the search horizon
    val never = Schedule.parse("cron(0 0 1 1 ? 2026)") // already in the past
    intercept[IllegalStateException](never.nextFire(at("2026-08-12T00:00:00Z")))
  }
}
