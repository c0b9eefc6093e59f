package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.engine.Summaries

/** Property-based invariants for the round-10 statistical operators —
  * random corpora checked against driver-side references and the
  * information-theoretic bounds example tests cannot sweep.
  */
class StatsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def corpora(n: Int, gen: Gen[List[(Long, Long)]]): Seq[List[(Long, Long)]] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  private val idValueGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(12, 60)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 500L)
      v <- Gen.choose(0L, 1000L)
    } yield (id, v))
  } yield rows.distinctBy(_._1).toList

  test("bootstrapMeanCI equals the driver-side Poisson-hash reference on random corpora") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(b: Int, id: Long): Long = {
      val hex = md.digest(s"boot$b:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16) % 1000000L
      if (u < 367879) 0L else if (u < 735759) 1L else if (u < 919699) 2L
      else if (u < 981012) 3L else if (u < 996340) 4L else if (u < 999406) 5L
      else 6L
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    corpora(12, idValueGen).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "v")
      val got = Sampling.bootstrapMeanCI(df, "id", "v", replicates = 15,
        loQ = 0.1, hiQ = 0.9).head()
      val means = (0 until 15).flatMap { b =>
        val ws = rows.map { case (id, v) => weight(b, id) * v }.sum
        val wn = rows.map { case (id, _) => weight(b, id) }.sum
        if (wn > 0) Some(ws.toDouble / wn.toDouble) else None
      }.sorted
      def pct(q: Double): Double = {
        val h = (means.size - 1) * q
        val lo = math.floor(h).toInt
        means(lo) + (h - lo) * (means(math.ceil(h).toInt) - means(lo))
      }
      assert(got.getLong(0) == rows.size.toLong)
      assert(got.getDouble(1) ==
        r6(rows.map(_._2).sum.toDouble / rows.size.toDouble))
      assert(got.getLong(2) == means.size.toLong)
      if (means.nonEmpty) {
        assert(got.getDouble(4) == r6(pct(0.1)))
        assert(got.getDouble(5) == r6(pct(0.9)))
      }
      // and the whole report is partitioning-independent
      assert(got == Sampling.bootstrapMeanCI(df.repartition(5), "id", "v",
        replicates = 15, loQ = 0.1, hiQ = 0.9).head())
    }
  }

  private val pairGen: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(10, 80)
    rows <- Gen.listOfN(n, for {
      x <- Gen.choose(0, 9)
      y <- Gen.choose(0, 9)
    } yield (x, y))
  } yield rows

  test("binnedMutualInformation: 0 <= MI <= min(H_x, H_y) + quantization slack") {
    (0 until 12).flatMap(i => pairGen(Gen.Parameters.default, Seed(100L + i)))
      .foreach { rows =>
        val df = rows.toDF("x", "y")
        val r = Summaries.binnedMutualInformation(df, "x", "y",
          xBins = 10, yBins = 10, xLo = 0, xHi = 10, yLo = 0, yHi = 10).head()
        val (mi, hx, hy) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
        // each quantized term can carry ≤5e-10; ≤100 cells ⇒ ≤1e-7 slack
        val eps = 1e-6
        assert(mi >= -eps, s"negative MI: $mi on $rows")
        assert(mi <= math.min(hx, hy) + eps, s"MI exceeds entropy: $r")
        // duplicating every row leaves all probabilities (hence every
        // report number) EXACTLY unchanged
        val doubled = Summaries.binnedMutualInformation(
          (rows ++ rows).toDF("x", "y"), "x", "y",
          xBins = 10, yBins = 10, xLo = 0, xHi = 10, yLo = 0, yHi = 10).head()
        assert(doubled.getLong(0) == 2L * r.getLong(0))
        assert((doubled.getDouble(3), doubled.getDouble(4), doubled.getDouble(5))
          == ((mi, hx, hy)))
      }
  }

  test("conformalCoverageReport matches the driver split+quantile reference on random corpora") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"conf$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000L
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    corpora(10, idValueGen).filter(_.size >= 12).foreach { rows =>
      val scored = rows.map { case (id, v) => (id, v.toDouble / 1000.0) }
      Seq((300, 0.5), (500, 0.8)).foreach { case (cp, kq) =>
        val got = Selection.conformalCoverageReport(
          scored.toDF("id", "score"), "id", "score",
          calibPermille = cp, keepQuantile = kq).head()
        val (calib, eval_) = scored.partition { case (id, _) => bucket(id) < cp }
        assert(got.getLong(0) == calib.size.toLong && got.getLong(1) == eval_.size.toLong)
        if (calib.nonEmpty && eval_.nonEmpty) {
          val cs = calib.map(_._2).sorted
          val h = (cs.size - 1) * kq
          val lo = math.floor(h).toInt
          val thr = cs(lo) + (h - lo) * (cs(math.ceil(h).toInt) - cs(lo))
          val thr9 = BigDecimal(thr).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          val kept = eval_.count(_._2 >= thr9)
          assert(got.getDouble(2) == r6(thr))
          assert(got.getDouble(4) == r6(kept.toDouble / eval_.size.toDouble))
        }
      }
    }
  }

  test("cardinalityPerWindow per window equals the hllSketch→hllEstimate pair on that window's items") {
    val dayGen: Gen[List[(Int, Long)]] = for {
      n <- Gen.choose(5, 80)
      rows <- Gen.listOfN(n, for {
        day <- Gen.choose(1, 3)
        user <- Gen.choose(0L, 300L)
      } yield (day, user))
    } yield rows
    (0 until 8).flatMap(i => dayGen(Gen.Parameters.default, Seed(500L + i)))
      .foreach { rows =>
        val ev = rows.map { case (d, u) =>
          (java.sql.Timestamp.valueOf(f"2024-01-0$d%d 06:00:00"), u)
        }.toDF("ts", "user_id")
        val got = graft.streaming.EventStreams
          .cardinalityPerWindow(ev, "user_id", "1 day", m = 64)
          .select(org.apache.spark.sql.functions.date_format(
            org.apache.spark.sql.functions.col("ws"), "yyyy-MM-dd").as("d"),
            org.apache.spark.sql.functions.col("n_zero_regs"),
            org.apache.spark.sql.functions.col("est_raw"),
            org.apache.spark.sql.functions.col("est"))
          .as[(String, Long, Double, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        rows.groupBy(_._1).foreach { case (day, dayRows) =>
          val items = dayRows.map(_._2).toDF("user_id")
          val ref = Profiling.hllEstimate(
            Profiling.hllSketch(items, "user_id", m = 64), m = 64)
            .select("n_zero_regs", "est_raw", "est")
            .as[(Long, Double, Double)].head()
          assert(got(f"2024-01-0$day%d") == ref,
            s"window $day diverged from the batch sketch pair")
        }
      }
  }

  test("linearFit2: translating y by a constant shifts b0 alone (up to 6-dp rounding)") {
    val base = (0L until 120L).map(i => (i % 13, (7 * i) % 11, (3 * i * i) % 97))
    Seq(5L, 1000L, -40L).foreach { c =>
      val a = Regression.linearFit2(base.toDF("x1", "x2", "y"),
        "x1", "x2", "y").head()
      val b = Regression.linearFit2(
        base.map { case (x1, x2, y) => (x1, x2, y + c) }.toDF("x1", "x2", "y"),
        "x1", "x2", "y").head()
      assert(math.abs(b.getDouble(1) - (a.getDouble(1) + c)) < 1e-4)
      assert(math.abs(b.getDouble(2) - a.getDouble(2)) < 1e-4)
      assert(math.abs(b.getDouble(3) - a.getDouble(3)) < 1e-4)
      // residuals are translation-invariant
      assert(math.abs(b.getDouble(5) - a.getDouble(5)) < 1e-4)
    }
  }
}
