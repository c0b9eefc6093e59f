package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Negative-zero-free rounding for cross-engine hash parity.
  *
  * A rounded double column whose input can dip a hair below zero is a
  * latent hash split: DuckDB's `round()` keeps IEEE signed zero (a
  * `-1e-9` input emits `-0.0`), while Spark's `round` goes through
  * `BigDecimal` HALF_UP, which has no signed zero and emits `0.0`.
  * The two values compare `==` but hash differently — exactly the
  * round-10 q162 failure (2 of 4,096 covariance cells).
  *
  * `zround` appends `+ 0.0`: IEEE `-0.0 + 0.0 = +0.0`, and `x + 0.0 = x`
  * bit-for-bit for every other double (including NaN and ±Inf), so the
  * normalization is a pure sign-of-zero canonicalizer. The oracle SQL
  * twin must state the same `+ 0.0` after its `round(...)` so BOTH
  * engines emit the positive-zero bit pattern.
  *
  * Use it on every rounded output whose value domain includes tiny
  * negatives (covariances, correlations, regression coefficients,
  * t-statistics, signed deviations, log-space sums); plain `round` is
  * fine for provably non-negative quantities (counts, fractions of
  * counts, distances, chi-squares).
  */
object Rounding {
  def zround(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
}
