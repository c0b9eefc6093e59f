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
}
