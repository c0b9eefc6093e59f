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
}
