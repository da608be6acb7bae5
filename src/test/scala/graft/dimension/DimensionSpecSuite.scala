package graft.dimension

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime

/** Semantic vectors ported from the reference's dimension suites
  * (test/intelliflow/core/signal_processing/dimension_constructs/ and the
  * doctests in dimension_constructs.py). Behavior, not code.
  */
class DimensionSpecSuite extends AnyFunSuite {

  // ---- alphanumeric string ± (dimension_constructs.py doctests 1390-1404)
  test("string alphanumeric increment") {
    assert(StringValue("NA01").plus(1).value == "NA02")
    assert(StringValue("99").plus(1).value == "100")
    assert(StringValue("AA").plus(2).value == "AC")
    assert(StringValue("trainingjob99").plus(1).value == "trainingjoc00")
    assert(StringValue("NA").concat("01").value == "NA01")
    assert(StringValue("9Z").plus(1).value == "10A")
    assert(StringValue("Z9").plus(1).value == "AA0")
  }

  test("string alphanumeric decrement, length-preserving, underflow") {
    assert(StringValue("NA02").minus(1).value == "NA01")
    assert(StringValue("100").minus(1).value == "099")
    assert(StringValue("Ab").minus(1).value == "Aa")
    assertThrows[ArithmeticException](StringValue("000").minus(1))
    assertThrows[ArithmeticException](StringValue("Aa").minus(27))
  }

  test("string case-insensitivity and format funcs") {
    val na = StringValue("NA", params = Map("insensitive" -> true))
    assert(na.matchesValue(StringValue("na")))
    assert(!StringValue("NA").matchesValue(StringValue("na")))
    assert(StringValue("NA", params = Map("format" -> "lower")).value == "na")
    assert(StringValue("na", params = Map("format" -> "upper")).value == "NA")
  }

  // ---- long with digits padding (dimension_constructs.py:1853-1998)
  test("long zero padding and arithmetic") {
    assert(LongValue(7, params = Map("digits" -> 3)).value == "007")
    assert(LongValue(7).plus(3).rawValue == 10L)
    assert(LongValue(10).minus(5).rawValue == 5L)
  }

  test("timezone conversion crosses day boundaries and formats locally") {
    val utc = DateValue(LocalDateTime.of(2026, 8, 12, 3, 0),
      params = Map("timezone" -> "UTC", "format" -> "%Y-%m-%d"))
    val pst = utc.atTimezone("PST")
    assert(pst.date == LocalDateTime.of(2026, 8, 11, 19, 0))
    assert(pst.value == "2026-08-11") // previous local day
    assert(utc.value == "2026-08-12")
    assert(utc.matchesValue(pst) && pst.matchesValue(utc)) // same instant
    val est = utc.atTimezone("EST")
    assert(est.date == LocalDateTime.of(2026, 8, 11, 22, 0))
    // naive (no tz declared) values keep naive equality semantics
    val naive = DateValue(LocalDateTime.of(2026, 8, 12, 3, 0))
    assert(!naive.matchesValue(pst))
    // equal wall-clock text in DIFFERENT zones = different instants: must
    // NOT match (instant equality is authoritative, not a fallback)
    val pstLocal = DateValue(LocalDateTime.of(2026, 8, 11, 19, 0),
      params = Map("timezone" -> "PST"))
    val utcSameText = DateValue(LocalDateTime.of(2026, 8, 11, 19, 0),
      params = Map("timezone" -> "UTC"))
    assert(!pstLocal.matchesValue(utcSameText))
    assert(!utcSameText.matchesValue(pstLocal))
  }

  test("IANA zone stepping is DST-aware") {
    // US DST spring-forward 2026-03-08: 02:00 -> 03:00 local
    val v = DateValue(LocalDateTime.of(2026, 3, 8, 1, 0),
      params = Map("timezone" -> "America/Los_Angeles", "granularity" -> "HOUR"))
    assert(v.plus(1).asInstanceOf[DateValue].date ==
      LocalDateTime.of(2026, 3, 8, 3, 0)) // 02:xx doesn't exist locally
    // a fixed offset (reference PST) has no DST: plain +1h
    val fixed = DateValue(LocalDateTime.of(2026, 3, 8, 1, 0),
      params = Map("timezone" -> "PST", "granularity" -> "HOUR"))
    assert(fixed.plus(1).asInstanceOf[DateValue].date ==
      LocalDateTime.of(2026, 3, 8, 2, 0))
  }

  test("fuzzy common-form parsing breadth (dateutil-like unambiguous forms)") {
    def p(s: String) = DimValue.parseDateTime(s, None)
    assert(p("2026-08-12T03:15:30.250").contains(LocalDateTime.of(2026, 8, 12, 3, 15, 30, 250000000)))
    assert(p("2026-08-12T03:15").contains(LocalDateTime.of(2026, 8, 12, 3, 15)))
    assert(p("2026/08/12 03:15:30").contains(LocalDateTime.of(2026, 8, 12, 3, 15, 30)))
    assert(p("2026.08.12").contains(LocalDateTime.of(2026, 8, 12, 0, 0)))
    assert(p("202608120315").contains(LocalDateTime.of(2026, 8, 12, 3, 15)))
    assert(p("Aug 12 2026").contains(LocalDateTime.of(2026, 8, 12, 0, 0)))
    assert(p("12 Aug 2026").contains(LocalDateTime.of(2026, 8, 12, 0, 0)))
    assert(p("August 12, 2026").contains(LocalDateTime.of(2026, 8, 12, 0, 0)))
    assert(p("not a date").isEmpty)
  }

  test("hour-bearing declared formats keep the hour field") {
    val parsed = DimValue.parseDateTime("2026-08-12 03", Some("%Y-%m-%d %H"))
    assert(parsed.contains(LocalDateTime.of(2026, 8, 12, 3, 0)))
  }

  test("declared datetime format beats the generic common-pattern parse") {
    // "%Y-%d-%m" on "2024-05-03" is day=5/month=3, NOT the ISO reading May 3
    val parsed = DimValue.parseDateTime("2024-05-03", Some("%Y-%d-%m"))
    assert(parsed.contains(LocalDateTime.of(2024, 3, 5, 0, 0)))
    // unparseable under the declared format still falls back to common forms
    val fallback = DimValue.parseDateTime("2024-07-30T12:00:00", Some("%Y%m%d"))
    assert(fallback.contains(LocalDateTime.of(2024, 7, 30, 12, 0)))
  }

  // ---- datetime formatting + granularity arithmetic (1751-1794)
  test("date format and granularity stepping") {
    val d = DateValue(LocalDateTime.of(2020, 7, 30, 0, 0),
      params = Map("format" -> "%Y-%m-%d"))
    assert(d.value == "2020-07-30")
    assert(d.minus(1).value == "2020-07-29")
    assert(d.minus(30).value == "2020-06-30")
    val m = DateValue(LocalDateTime.of(2020, 1, 31, 0, 0),
      params = Map("format" -> "%Y-%m", "granularity" -> "MONTH"))
    assert(m.plus(1).value == "2020-02")
    val h = DateValue(LocalDateTime.of(2020, 3, 3, 1, 0),
      params = Map("format" -> "%Y-%m-%d %H", "granularity" -> "HOUR"))
    assert(h.minus(2).value == "2020-03-02 23")
  }

  test("datetime parsing: iso, compact, date+hour separators, format fallback") {
    assert(DimValue.parseDateTime("2020-05-22", None).contains(LocalDateTime.of(2020, 5, 22, 0, 0)))
    assert(DimValue.parseDateTime("2020-03-03-01", None).contains(LocalDateTime.of(2020, 3, 3, 1, 0)))
    assert(DimValue.parseDateTime("20200522", None).contains(LocalDateTime.of(2020, 5, 22, 0, 0)))
    assert(DimValue.parseDateTime("2021012223", Some("%Y%m%d%H")).contains(LocalDateTime.of(2021, 1, 22, 23, 0)))
    assert(DimValue.parseDateTime("23", Some("%H")).get.getHour == 23)
  }

  test("date min clamp rejects earlier values") {
    assertThrows[IllegalArgumentException] {
      DateValue(LocalDateTime.of(2019, 1, 1, 0, 0),
        params = Map("format" -> "%Y-%m-%d", "min" -> "2020-01-01"))
    }
  }

  test("relative range TRUNCATES at min instead of voiding the expansion") {
    // reference semantics: min is a CLAMP (dimension_constructs.py:
    // 1494-1851) — an event 10 days past min with a _:-30 range yields
    // the 10 valid days, not nothing
    val rel = RelativeValue(-30, 0, Some("day"), Some(DimType.DATETIME),
      Map("format" -> "%Y-%m-%d", "min" -> "2020-01-01"))
    val datum = DateValue(LocalDateTime.of(2020, 1, 10, 0, 0), Some("day"),
      Map("format" -> "%Y-%m-%d", "min" -> "2020-01-01"))
    val expanded = rel.range(datum).map(_.value)
    assert(expanded.length == 10, s"expected 10 clamped days: $expanded")
    assert(expanded.head == "2020-01-10" && expanded.last == "2020-01-01")
    // datum itself below min: empty expansion, event matches nothing
    intercept[IllegalArgumentException](
      DateValue(LocalDateTime.of(2019, 12, 31, 0, 0), Some("day"),
        Map("format" -> "%Y-%m-%d", "min" -> "2020-01-01")))
  }

  test("unknown granularity strings fail loudly instead of DAY fallback") {
    val e = intercept[IllegalArgumentException] {
      DateValue(LocalDateTime.of(2020, 1, 1, 0, 0),
        params = Map("format" -> "%Y-%m-%d %H", "granularity" -> "HOURS"))
    }
    assert(e.getMessage.contains("HOURS"))
    // the six valid names (any case) still resolve
    DateValue(LocalDateTime.of(2020, 1, 1, 0, 0),
      params = Map("granularity" -> "day"))
    DateValue(LocalDateTime.of(2020, 1, 1, 0, 0),
      params = Map("granularity" -> "HOUR"))
  }

  test("chain merges same-value branches instead of dropping subtrees") {
    // two branches sharing region NA with DIFFERENT pinned days: the
    // intersection with all-pass must keep BOTH days (first-wins lost
    // the second branch's subtree)
    val spec = DimSpec.pretty(
      "region" -> (DimType.STRING, Map.empty[String, Any]),
      "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
    val left = DimFilter.loadRaw(spec, DimFilter.RawFilter(List(
      "NA" -> DimFilter.RawFilter(List("2021-01-01" -> DimFilter.RawFilter.empty)),
      "NA" -> DimFilter.RawFilter(List("2021-01-02" -> DimFilter.RawFilter.empty)))))
    val allPass = DimFilter.allPassFor(spec)
    val chained = left.chain(allPass).get
    val tuples = chained.tuples.map(_.map(_.value))
    assert(tuples.toSet == Set(Seq("NA", "2021-01-01"), Seq("NA", "2021-01-02")),
      s"same-value branch subtree lost: $tuples")
  }

  // ---- factory resolution (dimension_constructs.py:782-918)
  test("factory resolves raw values to proper variants") {
    assert(DimValue.resolve("*").isInstanceOf[AnyVal_])
    assert(DimValue.resolve("_:-30").isInstanceOf[RelativeValue])
    assert(DimValue.resolve("_").asInstanceOf[RelativeValue].relativeIndex == -1)
    assert(DimValue.resolve("_:-2:7").asInstanceOf[RelativeValue].shift == 7)
    assert(DimValue.resolve("2020-05-22").isInstanceOf[DateValue])
    assert(DimValue.resolve(42L).isInstanceOf[LongValue])
    assert(DimValue.resolve("NA").isInstanceOf[StringValue])
    val typed = DimValue.resolve("123", Dim(Some("reg"), Some(DimType.STRING)))
    assert(typed.isInstanceOf[StringValue])
  }

  // ---- relative range expansion (1116-1142 + RelativeVariant doctest)
  test("relative range expansion over long datum") {
    val r = RelativeValue(-5)
    val out = r.range(LongValue(10))
    assert(out.map(_.rawValue) == List(10L, 9L, 8L, 7L, 6L))
  }

  test("relative range expansion over date datum with granularity") {
    val r = RelativeValue(-3)
    val datum = DateValue(LocalDateTime.of(2020, 7, 30, 0, 0),
      params = Map("format" -> "%Y-%m-%d"))
    assert(r.range(datum).map(_.value) == List("2020-07-30", "2020-07-29", "2020-07-28"))
  }

  test("relative range with shift shifts the anchor (\"_:-2:7\")") {
    val r = RelativeValue(-2, shift = 7)
    val datum = DateValue(LocalDateTime.of(2020, 7, 30, 0, 0),
      params = Map("format" -> "%Y-%m-%d"))
    assert(r.range(datum).map(_.value) == List("2020-08-06", "2020-08-05"))
  }

  // ---- relative∩relative (1067-1108): narrower wins
  test("relative intersection keeps narrower range") {
    assert(RelativeValue(-30).intersect(RelativeValue(-15)).relativeIndex == -15)
    assert(RelativeValue(-15).intersect(RelativeValue(-30)).relativeIndex == -15)
    assert(RelativeValue(3).intersect(RelativeValue(5)).relativeIndex == 3)
    assert(RelativeValue(-3).intersect(RelativeValue(5)).relativeIndex == 0)
  }

  // ---- filter chaining (2087-2228, chain docstring examples)
  private val regionDaySpec = DimSpec.pretty(
    "region" -> (DimType.STRING, Map.empty[String, Any]),
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  test("chain narrows value sets (example 1 in reference docstring)") {
    val f1 = DimFilter.loadRaw(DimSpec.pretty("region" -> (DimType.STRING, Map.empty[String, Any])),
      DimFilter.RawFilter.leafValues("NA", "EU", "IN"))
    val f2 = DimFilter.loadRaw(DimSpec.pretty("region" -> (DimType.STRING, Map.empty[String, Any])),
      DimFilter.RawFilter.leafValues("NA"))
    val out = f1.chain(f2).get
    assert(out.values.map(_.value) == List("NA"))
  }

  test("finalizing chain explodes relative range (example 2 in docstring)") {
    val spec = DimSpec.pretty("n" -> (DimType.LONG, Map.empty[String, Any]))
    val f1 = DimFilter.loadRaw(spec, DimFilter.RawFilter.leafValues("_:3"))
    val f2 = DimFilter.loadRaw(spec, DimFilter.RawFilter.leafValues(5L))
    val out = f1.applyFilter(f2).get
    assert(out.values.map(_.rawValue) == List(5L, 6L, 7L))
  }

  test("wildcard absorbs concrete values; all_pass detection") {
    val ap = DimFilter.allPassFor(regionDaySpec)
    assert(ap.allPass)
    val concrete = DimFilter.branchOf(regionDaySpec, Seq("NA", "2021-01-13"))
    val out = ap.applyFilter(concrete).get
    assert(out.tuples.head.map(_.value) == List("NA", "2021-01-13"))
    assert(!out.allPass)
  }

  test("nested chain prunes non-overlapping branches") {
    val f1 = DimFilter.loadRaw(regionDaySpec, DimFilter.RawFilter(List(
      "NA" -> DimFilter.RawFilter.leafValues("2021-01-13"),
      "EU" -> DimFilter.RawFilter.leafValues("2021-01-14"))))
    val f2 = DimFilter.loadRaw(regionDaySpec, DimFilter.RawFilter(List(
      "EU" -> DimFilter.RawFilter.leafValues("*"))))
    val out = f1.chain(f2).get
    assert(out.tuples.map(_.map(_.value)) == List(List("EU", "2021-01-14")))
  }

  test("spec mismatch yields None; value miss yields empty filter") {
    val oneLevel = DimFilter.loadRaw(
      DimSpec.pretty("region" -> (DimType.STRING, Map.empty[String, Any])),
      DimFilter.RawFilter.leafValues("NA"))
    val twoLevel = DimFilter.branchOf(regionDaySpec, Seq("NA", "2021-01-13"))
    assert(oneLevel.chain(twoLevel).isEmpty)
    val miss = DimFilter.loadRaw(
      DimSpec.pretty("region" -> (DimType.STRING, Map.empty[String, Any])),
      DimFilter.RawFilter.leafValues("JP"))
    assert(oneLevel.chain(miss).get.isEmpty)
  }

  test("relative chained with relative at dev-time narrows; materialized later") {
    val spec = DimSpec.pretty("day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
    val f30 = DimFilter.loadRaw(spec, DimFilter.RawFilter.leafValues("_:-30"))
    val f15 = DimFilter.loadRaw(spec, DimFilter.RawFilter.leafValues("_:-15"))
    val narrowed = f30.chain(f15).get
    assert(narrowed.values.head.asInstanceOf[RelativeValue].relativeIndex == -15)
    val event = DimFilter.loadRaw(spec, DimFilter.RawFilter.leafValues("2020-07-30"))
    val exploded = narrowed.applyFilter(event).get
    assert(exploded.values.length == 15)
    assert(exploded.values.head.value == "2020-07-30")
    assert(exploded.values.last.value == "2020-07-16")
  }

  test("date format awareness in equality across formats") {
    val d1 = DateValue(LocalDateTime.of(2021, 1, 13, 0, 0), params = Map("format" -> "%Y-%m-%d"))
    val d2 = DateValue(LocalDateTime.of(2021, 1, 13, 0, 0), params = Map("format" -> "%d-%m-%Y"))
    assert(d1.matchesValue(d2))
  }
}
