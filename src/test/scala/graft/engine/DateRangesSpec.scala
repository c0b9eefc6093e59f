package graft.engine

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

class DateRangesSpec extends AnyFunSuite {
  import DateRanges._

  private val latest = LocalDate.parse("2024-08-01")

  test("epoch windows mirror constants.py:10-14") {
    assert(V1MaxDate == LocalDate.parse("2022-02-03"))
    assert(V2MaxDate == LocalDate.parse("2023-03-06"))
  }

  test("resolve clamps to the v3 window by default (client.py:100-117)") {
    val (a, b) = resolve(Some(LocalDate.parse("2020-01-01")), None, latest)
    assert(a == V3MinDate && b == latest)
    val (c, d) = resolve(None, Some(LocalDate.parse("2099-01-01")), latest)
    assert(c == V3MinDate && d == latest)
  }

  test("resolve honors v1/v2 inclusion flags") {
    val w = VersionWindow(v1 = true, v2 = true, v3 = false)
    val (a, b) = resolve(None, None, latest, w)
    assert(a == V1MinDate && b == V2MaxDate)
  }

  test("min never exceeds max after clamping") {
    val (a, b) = resolve(Some(latest.plusDays(10)), Some(V3MinDate.minusDays(10)), latest)
    assert(!b.isBefore(a))
  }

  test("datesInRange is inclusive on both ends (util.py:256-262)") {
    val ds = datesInRange(LocalDate.parse("2024-01-01"), LocalDate.parse("2024-01-03"))
    assert(ds.map(_.toString) == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
  }

  test("urlForDate formats the feed url (client.py:317-330)") {
    assert(urlForDate(LocalDate.parse("2024-01-28")) ==
      "https://epss.cyentia.com/epss_scores-2024-01-28.csv.gz")
  }

  test("parseDate coerces the reference TIME union (util.py:265-276)") {
    assert(parseDate("2024-01-02") == LocalDate.parse("2024-01-02"))
    assert(parseDate("2024-01-02T10:11:12") == LocalDate.parse("2024-01-02"))
    assert(parseDate(1704153600L) == LocalDate.parse("2024-01-02"))
    assert(parseDate(java.sql.Date.valueOf("2024-01-02")) == LocalDate.parse("2024-01-02"))
  }
}
