package graft.engine

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** EPSS model-version epochs and date-range resolution — pure driver-side
  * Scala (no cluster involvement), mirroring reference constants.py:10-14 and
  * client.py:100-117/333-376.
  *
  * The reference discovers the max available date with a network HEAD request
  * (client.py:386-402); this engine is offline-first: the max date is
  * injectable, defaulting to the store listing (SURVEY.md §7.6.4).
  */
object DateRanges {

  /** Model epochs (constants.py:10-14, NOTES.md:8-11). Each epoch's max date
    * is the next epoch's min minus one day (client.py:358-362, 372-376).
    */
  val V1MinDate: LocalDate = LocalDate.parse("2021-04-14")
  val V2MinDate: LocalDate = LocalDate.parse("2022-02-04")
  val V3MinDate: LocalDate = LocalDate.parse("2023-03-07")
  val V1MaxDate: LocalDate = V2MinDate.minusDays(1)
  val V2MaxDate: LocalDate = V3MinDate.minusDays(1)

  /** Which model epochs to include (client.py:63-65 include_v{1,2,3}). */
  final case class VersionWindow(v1: Boolean = false, v2: Boolean = false, v3: Boolean = true) {
    def minAllowed: LocalDate =
      if (v1) V1MinDate else if (v2) V2MinDate else V3MinDate
    def maxAllowed(latest: LocalDate): LocalDate =
      if (v3) latest else if (v2) V2MaxDate else V1MaxDate
  }

  /** Clamp a requested [min, max] to the allowed epoch window
    * (client.py:100-117): missing bounds default to the window edges; bounds
    * outside it are pulled in.
    */
  def resolve(
      min: Option[LocalDate],
      max: Option[LocalDate],
      latest: LocalDate,
      window: VersionWindow = VersionWindow()): (LocalDate, LocalDate) = {
    val lo = window.minAllowed
    val hi = window.maxAllowed(latest)
    val a = min.fold(lo)(d => if (d.isBefore(lo)) lo else if (d.isAfter(hi)) hi else d)
    val b = max.fold(hi)(d => if (d.isAfter(hi)) hi else if (d.isBefore(lo)) lo else d)
    (a, if (b.isBefore(a)) a else b)
  }

  /** Every day in [min, max] inclusive (util.py:256-262). */
  def datesInRange(min: LocalDate, max: LocalDate): Seq[LocalDate] =
    Iterator.iterate(min)(_.plusDays(1)).takeWhile(!_.isAfter(max)).toSeq

  /** Feed download URL for one day's snapshot (client.py:317-330). */
  def urlForDate(d: LocalDate): String =
    s"https://epss.cyentia.com/epss_scores-${d.format(DateTimeFormatter.ISO_LOCAL_DATE)}.csv.gz"

  /** URL per date in range (client.py:292-299 iter_urls). */
  def urlsInRange(min: LocalDate, max: LocalDate): Seq[String] =
    datesInRange(min, max).map(urlForDate)

  /** Permissive time coercion (constants.py:17 TIME union; util.py:265-276
    * parse_date): ISO date/datetime strings and unix epoch seconds → date.
    */
  def parseDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case d: java.sql.Date => d.toLocalDate
    case t: java.time.LocalDateTime => t.toLocalDate
    case t: java.time.Instant => t.atZone(java.time.ZoneOffset.UTC).toLocalDate
    case s: String if s.length > 10 => LocalDate.parse(s.substring(0, 10))
    case s: String => LocalDate.parse(s)
    case epoch: Long => java.time.Instant.ofEpochSecond(epoch).atZone(java.time.ZoneOffset.UTC).toLocalDate
    case epoch: Int => parseDate(epoch.toLong)
    case epoch: Double => parseDate(epoch.toLong)
    case other => throw new IllegalArgumentException(s"cannot coerce $other to a date")
  }
}
