package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("linearFit2 recovers an exact linear relation with r2 = 1 and rmse = 0") {
    // y = 2 + 3·x1 + 5·x2, integer-exact — the solve must land on the
    // plane to the last rounded digit
    val rows = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (x1, x2, 2L + 3L * x1 + 5L * x2)
    val df = rows.toDF("x1", "x2", "y")
    val Row(n: Long, b0: Double, b1: Double, b2: Double, r2: Double, rmse: Double) =
      Regression.linearFit2(df, "x1", "x2", "y").head()
    assert(n == 100L)
    assert(b0 == 2.0 && b1 == 3.0 && b2 == 5.0)
    assert(r2 == 1.0 && rmse == 0.0)
  }

  test("linearFit2 matches a driver-side normal-equations reference on noisy data") {
    // deterministic pseudo-noise: residual = (7·i mod 11) − 5
    val rows = (0L until 200L).map { i =>
      val x1 = i % 17
      val x2 = (3 * i) % 13
      (x1, x2, 1L + 2L * x1 + 4L * x2 + ((7 * i) % 11) - 5L)
    }
    val df = rows.toDF("x1", "x2", "y")
    val Row(n: Long, b0: Double, b1: Double, b2: Double, r2: Double, rmse: Double) =
      Regression.linearFit2(df, "x1", "x2", "y").head()
    assert(n == 200L)
    // driver reference: same moments, same Cramer expansion
    val (s1, s2, sy) = (rows.map(_._1).sum.toDouble, rows.map(_._2).sum.toDouble,
      rows.map(_._3).sum.toDouble)
    val s11 = rows.map(r => r._1 * r._1).sum.toDouble
    val s22 = rows.map(r => r._2 * r._2).sum.toDouble
    val s12 = rows.map(r => r._1 * r._2).sum.toDouble
    val s1y = rows.map(r => r._1 * r._3).sum.toDouble
    val s2y = rows.map(r => r._2 * r._3).sum.toDouble
    val syy = rows.map(r => r._3 * r._3).sum.toDouble
    val nn = 200.0
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double,
             g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(nn, s1, s2, s1, s11, s12, s2, s12, s22)
    val rb0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    val rb1 = det3(nn, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    val rb2 = det3(nn, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    val sse = syy - (rb0 * sy + rb1 * s1y + rb2 * s2y)
    val sst = syy - sy * sy / nn
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(b0 == r6(rb0) && b1 == r6(rb1) && b2 == r6(rb2))
    assert(r2 == r6(1.0 - sse / sst))
    assert(rmse == r6(math.sqrt(math.max(sse, 0.0) / nn)))
    // noise is bounded, so the fit must still explain almost everything
    assert(r2 > 0.9 && r2 < 1.0)
  }

  test("linearFit2 is partitioning-independent (decimal moment sums)") {
    val rows = (0L until 300L).map(i => (i % 23, (5 * i) % 19, (i * i) % 101))
    val df = rows.toDF("x1", "x2", "y")
    val a = Regression.linearFit2(df, "x1", "x2", "y").head()
    val b = Regression.linearFit2(df.repartition(7), "x1", "x2", "y").head()
    assert(a == b)
  }

  test("collinear design yields NULL coefficients, never garbage") {
    // x2 = 2·x1 exactly → singular normal matrix
    val df = (0L until 50L).map(i => (i, 2 * i, 3 * i + 1)).toDF("x1", "x2", "y")
    val r = Regression.linearFit2(df, "x1", "x2", "y").head()
    assert(r.getLong(0) == 50L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("null rows are excluded; argument gates fire") {
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 2L, 3L), (null, 4L, 5L), (2L, null, 6L), (3L, 4L, null), (4L, 1L, 7L))
      .toDF("x1", "x2", "y")
    val r = Regression.linearFit2(df, "x1", "x2", "y").head()
    assert(r.getLong(0) == 2L)
    val dbl = Seq((1.0, 2L, 3L)).toDF("x1", "x2", "y")
    intercept[IllegalArgumentException](Regression.linearFit2(dbl, "x1", "x2", "y"))
    val dup = Seq((1L, 2L, 3L)).toDF("x1", "x2", "y")
    intercept[IllegalArgumentException](Regression.linearFit2(dup, "x1", "x1", "y"))
  }
}
