package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property checks for the degree-oriented triangle enumeration: the
  * orientation trick (wedges from low-degree→high-degree edges, one apex
  * per triangle) is exactly the kind of claim a fixed fixture can't pin —
  * random graphs hit degree ties, hubs, multi-edges, self-loops, and
  * components of every shape. Reference: brute-force O(n³) enumeration
  * over the canonicalized edge set on the driver.
  */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private val graphGen: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.choose(3, 14)
    nEdges <- Gen.choose(0, 30)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong - 1)
      b <- Gen.choose(0L, nNodes.toLong - 1)
    } yield (a, b)) // raw: self-loops and duplicates on purpose
  } yield edges

  private def samples(n: Int): Seq[List[(Long, Long)]] =
    (0 until n).flatMap(i => graphGen(Gen.Parameters.default, Seed(i.toLong)))

  test("triangleStats equals brute-force per-node triangle counts on random graphs") {
    samples(30).filter(_.nonEmpty).foreach { edges =>
      val got = Graph.triangleStats(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap

      val canon = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val nodes = canon.flatMap(e => Set(e._1, e._2))
      val adj = nodes.map(v => v ->
        canon.collect { case (a, b) if a == v => b; case (a, b) if b == v => a })
        .toMap
      val tris = (for {
        a <- nodes; b <- nodes if a < b; c <- nodes if b < c
        if canon((a, b)) && canon((b, c)) && canon((a, c))
      } yield Set(a, b, c)).toSet
      assert(got.keySet == nodes, s"edges=$edges")
      nodes.foreach { v =>
        val deg = adj(v).size.toLong
        val t = tris.count(_.contains(v)).toLong
        val coeff =
          if (deg >= 2)
            BigDecimal(2.0 * t / (deg * (deg - 1)))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          else 0.0
        assert(got(v) == ((deg, t, coeff)),
          s"node $v: ${got(v)} vs ${(deg, t, coeff)} edges=$edges")
      }
    }
  }

  test("rankFusion equals the driver-side truncated-RRF reference on random tables") {
    val tableGen: Gen[(List[(String, Long, Double, Double)], Int)] = for {
      n <- Gen.choose(1, 25)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2", "g3")
        s1 <- Gen.choose(0, 5).map(_.toDouble) // coarse → rank ties common
        s2 <- Gen.choose(0, 5).map(_.toDouble)
      } yield (g, s1, s2))
      topK <- Gen.choose(1, 6)
    } yield (rows.zipWithIndex.map { case ((g, s1, s2), i) =>
      (g, i.toLong, s1, s2) }, topK)
    (0 until 25).flatMap(i => tableGen(Gen.Parameters.default, Seed(100L + i)))
      .foreach { case (rows, topK) =>
        val df = rows.toDF("g", "id", "s1", "s2")
        val got = Selection.rankFusion(df, "g", "id", Seq("s1", "s2"), topK)
          .as[(String, Long, Option[Long], Option[Long], Double)]
          .collect().toSet

        def list(score: (String, Long, Double, Double) => Double) =
          rows.groupBy(_._1).flatMap { case (g, rs) =>
            rs.sortBy(r => (-score(r._1, r._2, r._3, r._4), r._2))
              .take(topK).zipWithIndex
              .map { case (r, i) => (g, r._2) -> (i + 1L) }
          }
        val l1 = list((_, _, s1, _) => s1)
        val l2 = list((_, _, _, s2) => s2)
        val expect = (l1.keySet ++ l2.keySet).map { case (g, id) =>
          val r1 = l1.get((g, id)); val r2 = l2.get((g, id))
          val rrf = BigDecimal(
            r1.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
              r2.map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (g, id, r1, r2, rrf)
        }
        assert(got == expect, s"topK=$topK rows=$rows")
      }
  }
}
