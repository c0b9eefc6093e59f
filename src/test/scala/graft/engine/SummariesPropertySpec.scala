package graft.engine

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based funnel invariants (VERDICT r8 #5): random event streams
  * checked against a straightforward driver-side fold — the ordering edge
  * cases (decoy events before the gate, order ties, broken funnels, noise
  * types, duplicate events) are where example tests run thin.
  */
class SummariesPropertySpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("A", "B", "C")

  /** (user, order, type) streams: few users, colliding order values (ties
    * and strict-inequality edges are the point), a noise type X outside
    * the funnel, and duplicated events.
    */
  private val eventsGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(0, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 4L)
      o <- Gen.choose(1L, 15L)
      t <- Gen.oneOf("A", "B", "C", "X")
    } yield (u, o, t))
  } yield evs

  private def samples(n: Int): Seq[List[(Long, Long, String)]] =
    (0 until n).flatMap(i => eventsGen(Gen.Parameters.default, Seed(i.toLong)))

  /** The reference semantics, as a per-user in-memory fold: step 1 is the
    * earliest steps(0) event; step i is the earliest steps(i-1) event
    * STRICTLY after the completed step i-1; nulls cascade; users that
    * never reach step 1 are absent.
    */
  private def refFunnel(events: Seq[(Long, Long, String)])
      : Map[Long, (Seq[Option[Long]], Long)] =
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val completions = steps.zipWithIndex.foldLeft(Vector.empty[Option[Long]]) {
        case (acc, (st, i)) =>
          val gate = if (i == 0) Some(Long.MinValue) else acc.last
          val v = gate.flatMap { g =>
            val cands = evs.collect { case (_, o, t) if t == st && o > g => o }
            if (cands.isEmpty) None else Some(cands.min)
          }
          acc :+ v
      }
      if (completions.head.isEmpty) None
      else Some(u -> (completions.toSeq, completions.takeWhile(_.isDefined).size.toLong))
    }

  test("funnel equals the driver-side fold on random event streams") {
    samples(40).foreach { evs =>
      val df = evs.toDF("user_id", "event_id", "event_type")
      val out = Summaries.funnel(df, "user_id", "event_type", "event_id", steps)
        .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect()
        .map(r => r._1 -> (Seq(r._2, r._3, r._4), r._5)).toMap
      assert(out == refFunnel(evs), s"events: $evs")
    }
  }

  test("funnel invariants: step times strictly increase over the completed prefix") {
    samples(40).foreach { evs =>
      val df = evs.toDF("user_id", "event_id", "event_type")
      Summaries.funnel(df, "user_id", "event_type", "event_id", steps)
        .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect()
        .foreach { case (u, s1, s2, s3, n) =>
          val ss = Seq(s1, s2, s3)
          assert(ss.take(n.toInt).forall(_.isDefined) && ss.drop(n.toInt).forall(_.isEmpty),
            s"user $u: n_steps=$n inconsistent with $ss")
          val defined = ss.flatten
          assert(defined == defined.sorted && defined.distinct == defined,
            s"user $u: step times not strictly increasing: $defined")
        }
    }
  }

  test("sessionize equals a driver-side fold on random event streams") {
    // (user, epoch-seconds, id) with colliding timestamps (tie-break on
    // id) and gaps straddling the cutoff in both directions
    val gen: Gen[(List[(Long, Long, Long)], Long)] = for {
      n <- Gen.choose(0, 40)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        s <- Gen.choose(0L, 400L)
      } yield (u, s))
      gap <- Gen.oneOf(50L, 100L, 200L)
    } yield (evs.zipWithIndex.map { case ((u, s), i) => (u, s, i.toLong) }, gap)
    (0 until 40).flatMap(i => gen(Gen.Parameters.default, Seed(100L + i))).foreach {
      case (evs, gap) =>
        val df = evs
          .map { case (u, s, i) => (u, new java.sql.Timestamp(s * 1000L), i) }
          .toDF("user_id", "ts", "event_id")
        val got = Summaries.sessionize(df, "user_id", "ts", "event_id", gap)
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        // reference fold: order by (ts, id), break strictly above gap
        val expect = evs.groupBy(_._1).flatMap { case (u, es) =>
          val sorted = es.map { case (_, s, i) => (s, i) }.sorted
          val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, Long)]]) {
            case (acc, (s, i)) =>
              if (acc.isEmpty || s - acc.last.last._1 > gap) acc :+ Vector((s, i))
              else acc.init :+ (acc.last :+ ((s, i)))
          }
          sessions.zipWithIndex.map { case (ses, k) =>
            (u, k + 1L, ses.size.toLong, ses.map(_._2).min,
              (ses.last._1 - ses.head._1) * 1000000L)
          }
        }.toSet
        assert(got == expect, s"gap=$gap evs=$evs")
    }
  }

  test("funnel with a single step is min order per user over that type") {
    samples(20).foreach { evs =>
      val df = evs.toDF("user_id", "event_id", "event_type")
      val out = Summaries.funnel(df, "user_id", "event_type", "event_id", Seq("B"))
        .as[(Long, Option[Long], Long)].collect()
        .map(r => r._1 -> r._2).toMap
      val ref = evs.filter(_._3 == "B").groupBy(_._1)
        .map { case (u, es) => u -> Some(es.map(_._2).min) }
      assert(out == ref)
    }
  }

  /** (group, value) samples with deliberate value collisions across
    * groups — tie handling is where rank statistics implementations
    * diverge.
    */
  private val groupedGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(2, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 12L)
    } yield (g, v))
  } yield rows

  private def groupedSamples(n: Int): Seq[List[(String, Long)]] =
    (0 until n).flatMap(i => groupedGen(Gen.Parameters.default, Seed(100L + i)))
      .filter(rows => rows.map(_._1).distinct.size >= 2)

  test("ksDrift equals the brute-force group-vs-rest KS on random tied samples") {
    groupedSamples(25).foreach { rows =>
      val got = Summaries.ksDrift(rows.toDF("g", "v"), "v", "g")
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      rows.map(_._1).distinct.foreach { g =>
        val nt = rows.count(_._1 == g).toLong
        val nr = rows.size - nt
        val md = rows.map(_._2).distinct.map { v =>
          val ct = rows.count(r => r._1 == g && r._2 <= v).toLong
          val ca = rows.count(_._2 <= v).toLong
          math.abs(ct * nr - (ca - ct) * nt)
        }.max
        val (_, gNt, gNr, gKs) = got(g)
        assert((gNt, gNr) == (nt, nr))
        assert(gKs == md.toDouble / (nt * nr), s"ks for $g on $rows")
      }
    }
  }

  test("rankBiserial equals the brute-force tie-corrected U on random samples") {
    groupedSamples(25).foreach { rows =>
      val got = Summaries.rankBiserial(rows.toDF("g", "v"), "v", "g")
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val sorted = rows.map(_._2).sorted
      // doubled midrank per value from the combined sample
      val dblmid = rows.map(_._2).distinct.map { v =>
        val below = sorted.count(_ < v).toLong
        val cnt = sorted.count(_ == v).toLong
        v -> (2 * below + cnt + 1)
      }.toMap
      rows.map(_._1).distinct.foreach { g =>
        val nt = rows.count(_._1 == g).toLong
        val nr = rows.size - nt
        val r2 = rows.filter(_._1 == g).map(r => dblmid(r._2)).sum
        val expected = (r2 - nt * (nt + 1)).toDouble / (nt * nr) - 1.0
        assert(got(g)._4 == expected, s"r for $g on $rows")
        // bounded in [-1, 1]
        assert(got(g)._4 >= -1.0 && got(g)._4 <= 1.0)
      }
    }
  }

  test("giniByGroup equals the brute-force rank form and sits in [0, 1)") {
    groupedSamples(25).foreach { rows =>
      val withId = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      val got = Summaries.giniByGroup(withId.toDF("g", "id", "v"), "g", "v")
        .as[(String, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      withId.map(_._1).distinct.foreach { g =>
        val xs = withId.filter(_._1 == g).map(_._3).sorted
        val n = xs.size.toLong
        val s0 = xs.sum
        val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
        if (s0 > 0) {
          val expected = (2.0 * s1 - (n + 1) * s0) / (n.toDouble * s0)
          assert(got(g)._4 == Some(expected), s"gini for $g on $rows")
          assert(got(g)._4.get >= 0.0 && got(g)._4.get < 1.0)
        } else {
          assert(got(g)._4.isEmpty, s"all-zero group $g must be NULL")
        }
      }
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("welchTTest equals the brute-force moment form on random samples") {
    groupedSamples(25).foreach { rows =>
      val got = Summaries.welchTTest(rows.toDF("g", "v"), "v", "g")
        .as[(String, Long, Long, Option[Double], Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      val nn = rows.size.toLong
      val tsx = rows.map(_._2).sum
      val tsxx = rows.map(v => v._2 * v._2).sum
      rows.map(_._1).distinct.foreach { g =>
        val xs = rows.filter(_._1 == g).map(_._2)
        val nt = xs.size.toLong
        val nr = nn - nt
        val (ntd, nrd) = (nt.toDouble, nr.toDouble)
        val (sx, sxx) = (xs.sum, xs.map(v => v * v).sum)
        val (rsx, rsxx) = (tsx - sx, tsxx - sxx)
        // the operator's exact fixed-shape double expressions, restated
        val mt = sx.toDouble / ntd
        val mr = rsx.toDouble / nrd
        val vt = (sxx.toDouble - sx.toDouble * sx.toDouble / ntd) / (ntd - 1.0)
        val vr = (rsxx.toDouble - rsx.toDouble * rsx.toDouble / nrd) / (nrd - 1.0)
        val (st, sr) = (vt / ntd, vr / nrd)
        val se2 = st + sr
        val (_, gNt, gNr, gT, gDf) = got(g)
        assert((gNt, gNr) == (nt, nr))
        if (nt >= 2 && nr >= 2 && se2 > 0) {
          assert(gT.contains(round6((mt - mr) / math.sqrt(se2))), s"t for $g on $rows")
          val df = se2 * se2 / (st * st / (ntd - 1.0) + sr * sr / (nrd - 1.0))
          assert(gDf.contains(round6(df)), s"df for $g on $rows")
          // Welch df sits between min(n)-1 and the pooled n-2 (+rounding slack)
          assert(gDf.get >= math.min(ntd, nrd) - 1.0 - 1e-6 && gDf.get <= nn - 2.0 + 1e-6)
        } else {
          assert(gT.isEmpty && gDf.isEmpty, s"degenerate $g on $rows")
        }
      }
    }
  }

  /** (a, b) categorical pairs with absent-cell grids — zero-observed
    * cells still contribute their expectation to χ², the classic
    * implementation slip.
    */
  private val pairGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(2, 60)
    rows <- Gen.listOfN(n, for {
      a <- Gen.oneOf("a", "b", "c")
      b <- Gen.oneOf("x", "y")
    } yield (a, b))
  } yield rows

  test("categoricalAssociation equals the brute-force full-grid form") {
    val samples = (0 until 25)
      .flatMap(i => pairGen(Gen.Parameters.default, Seed(500L + i)))
    samples.foreach { rows =>
      val Array((n, rl, cl, chi2, vOpt, mi)) =
        Summaries.categoricalAssociation(rows.toDF("a", "b"), "a", "b")
          .as[(Long, Long, Long, Double, Option[Double], Double)].collect()
      val as = rows.map(_._1).distinct.sorted
      val bs = rows.map(_._2).distinct.sorted
      assert((n, rl, cl) == (rows.size.toLong, as.size.toLong, bs.size.toLong))
      val nd = rows.size.toDouble
      def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      // the operator's observed-cells-only identity, restated: χ² =
      // N + Σ_obs[(o−e)²/e − e] — but verified against the NAIVE full
      // R×C grid too (chiGrid below), the form a textbook states
      var chi = BigDecimal(0)
      var miSum = BigDecimal(0)
      var chiGrid = 0.0
      for (a <- as; b <- bs) {
        val o = rows.count(r => r == (a, b))
        val od = o.toDouble
        val rd = rows.count(_._1 == a).toDouble
        val cd = rows.count(_._2 == b).toDouble
        val e = rd * cd / nd
        chiGrid += (od - e) * (od - e) / e
        if (o > 0) {
          val dev = od * nd - rd * cd
          chi += r9(dev * dev / (nd * rd * cd) - rd * cd / nd)
          miSum += r9((od / nd) * math.log(od * nd / (rd * cd)))
        }
      }
      val chiOp = chi.toDouble + nd
      assert(chi2 == round6(chiOp), s"chi2 on $rows")
      // the identity holds vs the naive grid up to rounding dust
      assert(math.abs(chiOp - chiGrid) < 1e-6, s"grid identity on $rows")
      assert(mi == round6(miSum.toDouble), s"mi on $rows")
      assert(chi2 >= -1e-6 && mi >= -1e-6)
      if (math.min(rl, cl) >= 2) {
        val v = math.sqrt(chiOp / (nd * (math.min(rl, cl) - 1.0)))
        assert(vOpt.contains(round6(v)), s"V on $rows")
        assert(vOpt.get >= 0.0 && vOpt.get <= 1.0 + 1e-6)
      } else assert(vOpt.isEmpty)
    }
  }
}
