package graft.engine

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate descriptor — the Spark twin of the reference's frozen `Query`
  * dataclass (client.py:21-27) compiled by `filter_scores`
  * (client.py:270-290) into an AND-chain of filters.
  *
  * Two deliberate fixes over the reference, both flagged in SURVEY.md §2.13:
  *   - bounds of 0.0 are honored (`Option.isDefined`, not Python truthiness —
  *     client.py:278-288 skips `0.0` bounds);
  *   - CVE membership offers BOTH the reference's regex-alternation semantics
  *     (`cve.str.contains("a|b")`, client.py:275-276 — substring match, so
  *     CVE-2019-1653 also matches CVE-2019-16530) and sane exact `isin`.
  */
final case class EpssQuery(
    cveIds: Option[Seq[String]] = None,
    minEpss: Option[Double] = None,
    maxEpss: Option[Double] = None,
    minPercentile: Option[Double] = None,
    maxPercentile: Option[Double] = None,
    minDate: Option[LocalDate] = None,
    maxDate: Option[LocalDate] = None,
    exactCveMatch: Boolean = true) {

  /** Compile to a single conjunctive Column predicate; None when empty. */
  def predicate: Option[Column] = {
    val parts = Seq(
      minDate.map(d => col(Schemas.Date) >= lit(java.sql.Date.valueOf(d))),
      maxDate.map(d => col(Schemas.Date) <= lit(java.sql.Date.valueOf(d))),
      cveIds.filter(_.nonEmpty).map { ids =>
        if (exactCveMatch) col(Schemas.Cve).isin(ids: _*)
        // Reference-parity regex alternation (client.py:276). IDs are quoted
        // so the alternation stays a literal-substring match.
        else col(Schemas.Cve).rlike(ids.map(java.util.regex.Pattern.quote).mkString("|"))
      },
      minEpss.map(v => col(Schemas.Epss) >= v),
      maxEpss.map(v => col(Schemas.Epss) <= v),
      minPercentile.map(v => col(Schemas.Percentile) >= v),
      maxPercentile.map(v => col(Schemas.Percentile) <= v)
    ).flatten
    parts.reduceOption(_ && _)
  }

  /** Apply as `df.transform(q.filter)` — identity when no bounds are set. */
  def filter(df: DataFrame): DataFrame = predicate.fold(df)(df.filter)
}
