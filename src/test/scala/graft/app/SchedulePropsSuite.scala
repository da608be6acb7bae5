package graft.app

import java.time.{Instant, LocalDateTime, ZoneOffset}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, forAllNoShrink}

/** ScalaCheck properties over the cron/rate calendar math: for ANY
  * generated schedule and start instant, the computed next fire time is
  * strictly after the input and satisfies every field constraint — the
  * invariants a hand-picked example suite can miss. */
object SchedulePropsSuite extends Properties("schedule") {

  private val instantGen: Gen[Instant] = Gen.choose(
    Instant.parse("2020-01-01T00:00:00Z").getEpochSecond,
    Instant.parse("2031-12-30T23:59:59Z").getEpochSecond)
    .map(Instant.ofEpochSecond)

  /** `hi` caps generated EXPLICIT values (dom stays <= 28 so the day
    * exists in every month); `fieldMax` is the field's true upper bound,
    * which step expressions extend to (parser semantics: `a/s` = a..max). */
  private def fieldGen(lo: Int, hi: Int, fieldMax: Int = -1): Gen[(String, Set[Int])] = {
    val fm = if (fieldMax < 0) hi else fieldMax
    Gen.oneOf(
      Gen.const(("*", (lo to fm).toSet)),
      Gen.choose(lo, hi).map(v => (v.toString, Set(v))),
      for { a <- Gen.choose(lo, hi - 1); b <- Gen.choose(a, hi) }
        yield (s"$a-$b", (a to b).toSet),
      for { s <- Gen.choose(2, 7); a <- Gen.choose(lo, hi) }
        yield (s"$a/$s", (a to fm by s).toSet),
      Gen.nonEmptyListOf(Gen.choose(lo, hi)).map(vs =>
        (vs.distinct.mkString(","), vs.toSet)))
  }

  property("cron nextFire is strictly after and satisfies every field") =
    forAllNoShrink(fieldGen(0, 59), fieldGen(0, 23), fieldGen(1, 28, 31),
           fieldGen(1, 12), instantGen) { (min, hr, dom, mon, after) =>
      val expr = s"cron(${min._1} ${hr._1} ${dom._1} ${mon._1} ? *)"
      val t = Schedule.parse(expr).nextFire(after)
      val ldt = LocalDateTime.ofInstant(t, ZoneOffset.UTC)
      // dom is generated over 1-28 so explicit values exist in every
      // month, but the '*' wildcard legitimately fires on days 29-31
      def ok(f: (String, Set[Int]), v: Int): Boolean =
        f._1 == "*" || f._2.contains(v)
      t.isAfter(after) &&
        ok(min, ldt.getMinute) && ok(hr, ldt.getHour) &&
        ok(dom, ldt.getDayOfMonth) && ok(mon, ldt.getMonthValue) &&
        ldt.getSecond == 0 && ldt.getNano == 0
    }

  property("cron nextFire is the MINIMAL matching instant") =
    forAll(fieldGen(0, 59), fieldGen(0, 23), instantGen) { (min, hr, after) =>
      // dense day fields keep the brute-force scan short: walk minute by
      // minute from `after` and the first match must equal nextFire
      val c = Schedule.parse(s"cron(${min._1} ${hr._1} * * ? *)")
      val t = c.nextFire(after)
      var probe = LocalDateTime.ofInstant(after, ZoneOffset.UTC)
        .withSecond(0).withNano(0).plusMinutes(1)
      while (!(min._2.contains(probe.getMinute) && hr._2.contains(probe.getHour)))
        probe = probe.plusMinutes(1)
      t == probe.toInstant(ZoneOffset.UTC)
    }

  property("cron dow constraint holds (AWS 1=SUN..7=SAT)") =
    forAll(Gen.choose(1, 7), instantGen) { (dow, after) =>
      val t = Schedule.parse(s"cron(0 0 ? * $dow *)").nextFire(after)
      val ldt = LocalDateTime.ofInstant(t, ZoneOffset.UTC)
      ldt.getDayOfWeek.getValue % 7 + 1 == dow && t.isAfter(after)
    }

  property("rate fires on anchored multiples, strictly after") =
    forAll(Gen.choose(1L, 48L), Gen.oneOf("minutes", "hours"), instantGen,
           instantGen) { (n, unit, anchor, after) =>
      val r = Schedule.parse(s"rate($n $unit)", rateAnchor = anchor)
      val t = r.nextFire(after)
      val periodMs = (if (unit == "minutes") 60L else 3600L) * 1000L * n
      val delta = t.toEpochMilli - anchor.toEpochMilli
      t.isAfter(after) && delta >= 0 && delta % periodMs == 0 &&
        // minimality: the previous multiple is not after `after` (unless
        // t IS the anchor — nothing fires before the anchor by design)
        (delta == 0 || !t.minusMillis(periodMs).isAfter(after))
    }
}
