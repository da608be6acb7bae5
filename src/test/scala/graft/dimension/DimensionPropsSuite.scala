package graft.dimension

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import java.time.LocalDateTime

/** Property-based laws for the variant arithmetic (SURVEY.md §5: ScalaCheck
  * for dimension-variant semantics fidelity). */
object DimensionPropsSuite extends Properties("dimension") {

  private val alnumGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaLowerChar, Gen.alphaUpperChar, Gen.numChar))
  } yield cs.mkString

  property("string increment inverted by decrement (no overflow growth)") =
    forAll(alnumGen, Gen.choose(1, 50)) { (s, n) =>
      val up = StringValue(s).plus(n)
      // decrement is length-preserving; round-trip holds whenever the
      // increment didn't grow the string
      up.value.toString.length != s.length || up.minus(n).value == s
    }

  property("string increment grows or advances lexicographically") =
    forAll(alnumGen) { s =>
      val up = StringValue(s).plus(1).value.toString
      if (up.length != s.length) up.length > s.length else up != s
    }

  private val dateGen: Gen[LocalDateTime] = for {
    y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23)
  } yield LocalDateTime.of(y, m, d, h, 0)

  private val granGen: Gen[String] =
    Gen.oneOf("MINUTE", "HOUR", "DAY", "WEEK", "MONTH", "YEAR")

  property("date plus(n).minus(n) identity across granularities") =
    forAll(dateGen, granGen, Gen.choose(1, 100)) { (dt, g, n) =>
      val v = DateValue(dt, params = Map("granularity" -> g))
      v.plus(n).minus(n).asInstanceOf[DateValue].date == dt
    }

  property("relative intersection commutative and narrowing") =
    forAll(Gen.choose(-100, -1), Gen.choose(-100, -1)) { (a, b) =>
      val ab = RelativeValue(a).intersect(RelativeValue(b)).relativeIndex
      val ba = RelativeValue(b).intersect(RelativeValue(a)).relativeIndex
      ab == ba && ab == math.max(a, b) // closer to zero = narrower
    }

  property("range expansion length and endpoints") =
    forAll(Gen.choose(-60, -1), Gen.choose(0L, 10000L)) { (r, base) =>
      val out = RelativeValue(r).range(LongValue(base))
      out.length == math.abs(r) &&
        out.head.rawValue == base &&
        out.last.rawValue == base - (math.abs(r) - 1)
    }

  property("chaining a concrete filter with itself is identity") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 500L)).map(_.distinct)) { vs =>
      val spec = DimSpec.pretty("n" -> (DimType.LONG, Map.empty[String, Any]))
      val f = DimFilter.loadRaw(spec,
        DimFilter.RawFilter(vs.map(v => (v: Any) -> DimFilter.RawFilter.empty)))
      f.chain(f).get.values.map(_.rawValue) == f.values.map(_.rawValue)
    }

  property("long zero-padding formats and parses back") =
    forAll(Gen.choose(0L, 99999L), Gen.choose(6, 10)) { (v, digits) =>
      val s = LongValue(v, params = Map("digits" -> digits)).value.toString
      s.length == digits && s.toLong == v
    }

  property("timezone: UTC and PST locals of one instant match both ways") =
    forAll(dateGen) { dt =>
      val utc = DateValue(dt, params = Map("timezone" -> "UTC"))
      val pst = utc.atTimezone("PST")
      utc.instant == pst.instant &&
        utc.matchesValue(pst) && pst.matchesValue(utc) &&
        // -8h offset: the PST local day shifts back exactly when hour < 8
        (pst.date.toLocalDate != dt.toLocalDate) == (dt.getHour < 8)
    }

  property("timezone: atTimezone round-trip restores the local value") =
    forAll(dateGen, Gen.oneOf("UTC", "PST", "EST")) { (dt, tz) =>
      val v = DateValue(dt, params = Map("timezone" -> tz))
      v.atTimezone("PST").atTimezone(tz).date == dt
    }

  property("timezone: stepping preserves the declared zone's local calendar") =
    forAll(dateGen, Gen.choose(1, 72)) { (dt, n) =>
      val v = DateValue(dt, params = Map("timezone" -> "PST", "granularity" -> "HOUR"))
      v.plus(n).minus(n).asInstanceOf[DateValue].date == dt
    }

  property("factory resolve handles arbitrary alphanumeric strings safely") =
    forAll(alnumGen) { s =>
      DimValue.resolve(s) match {
        case _: StringValue | _: LongValue | _: DateValue => true
        case _ => false
      }
    }
}
