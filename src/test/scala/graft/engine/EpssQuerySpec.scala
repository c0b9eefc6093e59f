package graft.engine

import java.sql.Date

import graft.SparkSpec

/** The §2.13 semantic traps: regex-vs-exact CVE membership and honored 0.0
  * bounds.
  */
class EpssQuerySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val df = Seq(
    Score(d("2024-01-01"), "CVE-2019-1653", 0.10, 0.5),
    Score(d("2024-01-01"), "CVE-2019-16530", 0.20, 0.6),
    Score(d("2024-01-01"), "CVE-2020-0001", 0.00, 0.0)
  ).toDF()

  test("exact CVE membership matches only the listed ids") {
    val q = EpssQuery(cveIds = Some(Seq("CVE-2019-1653")))
    assert(q.filter(df).as[Score].collect().map(_.cve).toSet == Set("CVE-2019-1653"))
  }

  test("reference-parity regex membership also matches prefix-colliding ids (client.py:276)") {
    val q = EpssQuery(cveIds = Some(Seq("CVE-2019-1653")), exactCveMatch = false)
    assert(q.filter(df).as[Score].collect().map(_.cve).toSet ==
      Set("CVE-2019-1653", "CVE-2019-16530"))
  }

  test("0.0 bounds are honored, unlike the reference's truthiness skip (client.py:278)") {
    val q = EpssQuery(minEpss = Some(0.05))
    assert(q.filter(df).count() == 2)
    // min 0.0 keeps everything but is APPLIED (not skipped) — an explicit
    // max 0.0 keeps only the zero row, which Python truthiness would skip
    val qZero = EpssQuery(maxEpss = Some(0.0))
    assert(qZero.filter(df).as[Score].collect().map(_.cve).toSet == Set("CVE-2020-0001"))
  }

  test("date bounds + empty query") {
    assert(EpssQuery().filter(df).count() == 3)
    val q = EpssQuery(minDate = Some(java.time.LocalDate.parse("2024-01-02")))
    assert(q.filter(df).count() == 0)
  }
}
