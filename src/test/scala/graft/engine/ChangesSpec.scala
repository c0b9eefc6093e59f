package graft.engine

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the flagship quantization transform — the SURVEY.md §2.13
  * traps each get an explicit check.
  */
class ChangesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // a tiny dense score matrix: CVE A changes on day 3; CVE B never changes;
  // CVE C first appears on day 2 and changes on day 3
  private lazy val dense = Seq(
    Score(d("2024-01-01"), "CVE-A", 0.10, 0.5),
    Score(d("2024-01-02"), "CVE-A", 0.10, 0.5),
    Score(d("2024-01-03"), "CVE-A", 0.20, 0.6),
    Score(d("2024-01-01"), "CVE-B", 0.30, 0.7),
    Score(d("2024-01-02"), "CVE-B", 0.30, 0.7),
    Score(d("2024-01-03"), "CVE-B", 0.30, 0.7),
    Score(d("2024-01-02"), "CVE-C", 0.40, 0.8),
    Score(d("2024-01-03"), "CVE-C", 0.45, 0.9)
  ).toDF()

  test("changedRows keeps only rows whose value differs from the previous row per key") {
    val out = Changes.changedRows(dense, "cve", Seq("date"), "epss")
      .select("cve", "date").as[(String, Date)].collect().toSet
    // F5: lag=null on each key's first row ⇒ dropped (null != 0 is null)
    assert(out == Set(("CVE-A", d("2024-01-03")), ("CVE-C", d("2024-01-03"))))
  }

  test("changedScores clips to minDate (corrected baseline-day semantics, SURVEY §2.13.1)") {
    // scan covers the baseline day 01-02; request starts 01-03
    val out = Changes.changedScores(dense, Some(java.time.LocalDate.parse("2024-01-03")))
    val rows = out.as[Score].collect()
    assert(rows.forall(!_.date.before(d("2024-01-03"))))
    assert(rows.map(_.cve).toSet == Set("CVE-A", "CVE-C"))
  }

  test("changedScores orders by (date asc, cve desc) with canonical columns (O1/P1)") {
    val out = Changes.changedScores(dense)
    assert(out.columns.toSeq == Seq("date", "cve", "epss", "percentile"))
    val rows = out.as[Score].collect()
    assert(rows.map(r => (r.date.toString, r.cve)).toSeq ==
      rows.map(r => (r.date.toString, r.cve)).sortBy { case (dt, c) => (dt, negate(c)) }.toSeq)
  }

  private def negate(s: String): String = // descending string order helper
    s.map(c => (255 - c.toInt).toChar)

  test("forwardFill reconstructs the dense matrix from each key's first change onward") {
    val changes = Changes.changedRows(dense, "cve", Seq("date"), "epss")
    // spine = all (date, cve) combos present in dense
    val spine = dense.select("date", "cve")
    val filled = Changes.forwardFill(changes, spine)
      .select("date", "cve", "epss").as[(Date, String, Double)].collect().toSet
    // CVE-A is reconstructable from 01-03 (its first change); same for C
    assert(filled.contains((d("2024-01-03"), "CVE-A", 0.20)))
    assert(filled.contains((d("2024-01-03"), "CVE-C", 0.45)))
    // B never changed ⇒ never reconstructable (dropped, epss null)
    assert(!filled.exists(_._2 == "CVE-B"))
  }

  test("betweenSnapshots diffs two days: changed values + first sightings kept") {
    val dayA = dense.filter($"date" === d("2024-01-02"))
    val dayB = dense.filter($"date" === d("2024-01-03"))
    val out = Changes.betweenSnapshots(dayA, dayB)
      .select($"cve", $"epss").as[(String, Double)].collect().toSet
    // A changed 0.10→0.20; B unchanged (dropped); C changed 0.40→0.45
    assert(out == Set(("CVE-A", 0.20), ("CVE-C", 0.45)))
    // first sighting: C absent on day 1 → kept when diffing day1→day2
    val out2 = Changes.betweenSnapshots(
      dense.filter($"date" === d("2024-01-01")),
      dense.filter($"date" === d("2024-01-02")))
      .select($"cve").as[String].collect().toSet
    assert(out2 == Set("CVE-C"))
  }

  test("quantization is idempotent: changes of changes = changes") {
    val once = Changes.changedRows(dense, "cve", Seq("date"), "epss")
    val twice = Changes.changedRows(once, "cve", Seq("date"), "epss")
    // each key's first row in `once` is dropped again, so twice ⊆ once with
    // first-sightings removed — for our fixture each key has exactly one
    // change row, so twice is empty
    assert(twice.count() == 0)
  }

  test("snapshotDiff classifies added/removed/changed null-safely, drops unchanged") {
    val before = Seq(
      (1L, Some("alpha"), "en"),
      (2L, Some("beta"), "en"),
      (3L, Some("gamma"), "de"),   // removed
      (4L, None: Option[String], "fr")
    ).toDF("id", "text", "lang")
    val after = Seq(
      (1L, Some("alpha"), "en"),               // unchanged -> dropped
      (2L, Some("beta EDITED"), "en"),         // changed
      (4L, None: Option[String], "fr"),        // null == null -> unchanged
      (5L, Some("delta"), "zh")                // added
    ).toDF("id", "text", "lang")
    val out = Changes.snapshotDiff(before, after, "id", Seq("text", "lang"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "changed"), (3L, "removed"), (5L, "added")))
    intercept[IllegalArgumentException](
      Changes.snapshotDiff(before, after, "id", Seq.empty))
  }

  test("scd2 collapses runs and stamps [valid_from, valid_to) per key") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 20.0), (1L, 4L, 10.0),
      (2L, 1L, 5.0)
    ).toDF("user_id", "event_id", "value")
    val out = Changes.scd2(log, "user_id", "event_id", "value")
      .orderBy("user_id", "valid_from")
      .as[(Long, Double, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, 10.0, 1L, Some(3L)),  // run (1,2) collapsed; superseded at 3
      (1L, 20.0, 3L, Some(4L)),
      (1L, 10.0, 4L, None),      // value RETURNS: a new version, not a merge
      (2L, 5.0, 1L, None)))      // single observation = current forever
  }
}
