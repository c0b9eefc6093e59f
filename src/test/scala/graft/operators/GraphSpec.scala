package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches a driver-side reference on a small directed graph") {
    // 4-node graph: 0→1, 0→2, 1→2, 2→0, 3→2 (node 3 is a dangling
    // source for in-links; every node appears)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", damping = 0.85, iters = 5)
      .orderBy("node").as[(Long, Double)].collect().toSeq

    // reference: same recurrence, same 12-dp re-quantization
    val out = Map(0L -> Seq(1L, 2L), 1L -> Seq(2L), 2L -> Seq(0L), 3L -> Seq(2L))
    val n = 4
    var r = Seq(0L, 1L, 2L, 3L).map(v => v -> 1.0 / n).toMap
    val teleport = (1.0 - 0.85) / n
    for (_ <- 1 to 5) {
      val contrib = out.toSeq.flatMap { case (u, vs) =>
        vs.map(v => v -> r(u) / vs.size)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = r.keys.map { v =>
        val x = teleport + 0.85 * contrib.getOrElse(v, 0.0)
        v -> BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    got.foreach { case (v, rank) =>
      assert(math.abs(rank - r(v)) < 1e-12, s"node $v: $rank vs ${r(v)}")
    }
    // node 2 (most in-links) must outrank the dangling node 3
    val m = got.toMap
    assert(m(2L) > m(3L))
  }

  test("pageRank validates damping and the fixed-iteration contract") {
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(edges, "src", "dst", 1.0, 5))
    intercept[IllegalArgumentException](Graph.pageRank(edges, "src", "dst", 0.85, 0))
    intercept[IllegalArgumentException](Graph.pageRank(edges, "src", "dst", 0.85, 51))
  }
}
