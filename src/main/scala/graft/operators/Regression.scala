package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.zround
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Closed-form ordinary least squares over integral feature columns —
  * the one-pass "train a linear quality model on the whole corpus"
  * operator (predict an expensive signal from cheap ones, weight
  * features for a mixing policy, sanity-check that a score is linearly
  * explainable before shipping it).
  *
  * Why closed-form instead of gradient descent: with two features plus
  * an intercept the normal equations are a 3×3 solve — every sufficient
  * statistic is a sum of per-row integer products, so ONE map-side-
  * combinable aggregation reduces the entire corpus to a single
  * 10-number row and the "training loop" is scalar arithmetic ON that
  * row. No iterations, no weight broadcasts, no convergence question —
  * at 100 TB the cost is exactly one corpus scan.
  *
  * Cross-engine exactness: inputs are REQUIRED integral (the per-row
  * products are exact BIGINTs — document the |x1·x2| < 2⁶³ bound at the
  * call site) and the moment sums are DECIMAL(38,0) — order-independent,
  * so partitioning never changes a digit. The 3×3 Cramer solve and the
  * R² identity are evaluated in ONE canonical double expression (same
  * formula text in the DuckDB twin → identical IEEE results), then
  * quantized at 6 dp.
  */
object Regression {

  /** 3×3 determinant in the canonical cofactor order — the expression is
    * mirrored VERBATIM in the oracle twin; do not re-associate.
    */
  private def det3(a: Column, b: Column, c: Column,
                   d: Column, e: Column, f: Column,
                   g: Column, h: Column, i: Column): Column =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** OLS fit `y ~ b0 + b1·x1 + b2·x2` via the normal equations.
    *
    * Output: ONE row `(n, b0, b1, b2, r2, rmse)` — coefficient estimates
    * (6 dp), the coefficient of determination, and the training RMSE.
    * Rows with a NULL in any column are excluded (a row that cannot
    * prove its features does not train). A collinear design
    * (determinant exactly 0 in doubles) yields NULL coefficients rather
    * than garbage.
    *
    * SSE uses the matrix identity `Σy² − βᵀXᵀy` (valid at the exact OLS
    * optimum, evaluated with UNROUNDED coefficients); `r2 = 1 − SSE/SST`;
    * `rmse = √(max(SSE,0)/n)` — the max() absorbs the ~1-ulp negative
    * SSE a perfectly-fit corpus can produce.
    */
  def linearFit2(df: DataFrame, x1Col: String, x2Col: String, yCol: String): DataFrame = {
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    Seq(x1Col, x2Col, yCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(integral.contains(dt),
        s"$c must be an integral column (exact moments contract), got $dt")
    }
    require(Seq(x1Col, x2Col, yCol).distinct.size == 3,
      s"x1/x2/y must be three distinct columns: $x1Col, $x2Col, $yCol")

    def s(e: Column) = sum(e.cast("decimal(38,0)"))
    val (x1, x2, y) = (col(x1Col).cast("long"), col(x2Col).cast("long"), col(yCol).cast("long"))
    val m = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull && col(yCol).isNotNull)
      .agg(
        count(lit(1)).as("__n"),
        s(x1).as("__s1"), s(x2).as("__s2"), s(y).as("__sy"),
        s(x1 * x1).as("__s11"), s(x2 * x2).as("__s22"), s(x1 * x2).as("__s12"),
        s(x1 * y).as("__s1y"), s(x2 * y).as("__s2y"), s(y * y).as("__syy"))

    val n = col("__n").cast("double")
    val (s1, s2, sy) = (col("__s1").cast("double"), col("__s2").cast("double"), col("__sy").cast("double"))
    val (s11, s22, s12) = (col("__s11").cast("double"), col("__s22").cast("double"), col("__s12").cast("double"))
    val (s1y, s2y, syy) = (col("__s1y").cast("double"), col("__s2y").cast("double"), col("__syy").cast("double"))

    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    val b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    val b2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    val sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    val sst = syy - sy * sy / n
    val ok = col("__n") > 0 && det =!= lit(0.0)
    m.select(
      col("__n").as("n"),
      when(ok, zround(b0, 6)).as("b0"),
      when(ok, zround(b1, 6)).as("b1"),
      when(ok, zround(b2, 6)).as("b2"),
      when(ok && sst =!= lit(0.0), zround(lit(1.0) - sse / sst, 6)).as("r2"),
      when(ok, round(sqrt(greatest(sse, lit(0.0)) / n), 6)).as("rmse"))
  }
}
