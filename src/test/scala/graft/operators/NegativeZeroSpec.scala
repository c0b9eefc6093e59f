package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Rounding.zround

/** The round-10 q162 defect class, pinned: a rounded double whose true
  * value is a tiny negative must emit POSITIVE zero (bit pattern 0L) so
  * the Spark arm and the `round(...) + 0.0` DuckDB oracle arm hash
  * identically. Covers the [[graft.functions.Rounding.zround]] kernel
  * itself, a planted tiny-negative-covariance fixture through
  * [[Similarity.covarianceMatrix]], and the upper-triangle mirror's
  * bit-level symmetry.
  */
class NegativeZeroSpec extends SparkSpec {
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
  private val posZeroBits = bits(0.0)

  test("zround canonicalizes -0.0 to +0.0 and is the identity elsewhere") {
    val row = spark.range(1).select(
      zround(lit(-0.0), 6).as("nz"),
      zround(lit(-1e-9), 6).as("tiny"),
      zround(lit(-1.25), 2).as("neg"),
      zround(lit(3.141592653), 4).as("pos"),
      zround(lit(Double.NaN), 6).as("nan")).head()
    assert(bits(row.getDouble(0)) === posZeroBits)
    assert(bits(row.getDouble(1)) === posZeroBits)
    assert(row.getDouble(2) === -1.25)
    assert(row.getDouble(3) === 3.1416)
    assert(row.getDouble(4).isNaN)
  }

  test("Spark round alone already avoids -0.0 (the asymmetry zround papers over)") {
    // documents WHY only the oracle arm strictly needs `+ 0.0`: Spark's
    // BigDecimal HALF_UP round has no signed zero, DuckDB's keeps it —
    // zround makes the Spark arm's contract explicit instead of implicit
    val r = spark.range(1)
      .select(round(lit(-1e-9), 6).as("r")).head().getDouble(0)
    assert(bits(r) === posZeroBits)
  }

  test("covarianceMatrix emits +0.0 for a planted tiny-negative covariance cell") {
    // two 2-dim vectors with Σx = Σy = 0 and Σxy = -2e-7:
    // cov(0,1) = (-2e-7 - 0)/2 / 2 = -5e-8 → rounds to zero FROM BELOW
    val df = Seq(
      (1L, Seq(1.0f, -1e-7f)),
      (2L, Seq(-1.0f, 1e-7f))).toDF("id", "vec")
    val cells = Similarity.covarianceMatrix(df, "vec")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cells.size === 4)
    assert(cells((0L, 1L)) === 0.0)
    assert(bits(cells((0L, 1L))) === posZeroBits)
    assert(bits(cells((1L, 0L))) === posZeroBits)
    // the variance cells are honestly positive
    assert(cells((0L, 0L)) === 1.0)
  }

  test("upper-triangle mirror is bit-identical and matches the full-Gram reference") {
    // deterministic pseudo-random corpus, signed components
    val d = 6
    val rows = (0 until 40).map { i =>
      (i.toLong, (0 until d).map(j =>
        (((i * 31 + j * 17 + 7) % 19) - 9).toFloat / 4.0f))
    }
    val df = rows.toDF("id", "vec")
    val got = Similarity.covarianceMatrix(df, "vec")
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    assert(got.size === d * d)
    // bit-level symmetry by construction
    for (i <- 0 until d; j <- 0 until d)
      assert(bits(got((i, j))) === bits(got((j, i))), s"asym at ($i,$j)")
    // driver reference: same raw-moment formula, decimal-exact sums
    val n = rows.size
    def ref(i: Int, j: Int): Double = {
      var sxy = BigDecimal(0); var sx = BigDecimal(0); var sy = BigDecimal(0)
      rows.foreach { case (_, v) =>
        val xi = v(i).toDouble; val xj = v(j).toDouble
        sxy += BigDecimal(xi * xj).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        sx += BigDecimal(xi).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        sy += BigDecimal(xj).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val raw = (sxy.toDouble - sx.toDouble * sy.toDouble / n) / n
      val r = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r + 0.0
    }
    for (i <- 0 until d; j <- 0 until d)
      assert(got((i, j)) === ref(i, j), s"value at ($i,$j)")
  }
}
