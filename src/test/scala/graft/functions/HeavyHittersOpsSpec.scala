package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: capacity >= distinct keys reproduces exact counts on any partitioning") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(25)("c") ++
      Seq.fill(7)("d") ++ Seq.fill(3)("e")
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val got = items.toDF("item").repartition(parts)
        .agg(HeavyHittersOps.heavyHitters(100, 100, col("item")).as("hh"))
        .select(posexplode(col("hh")).as(Seq("rn", "e")))
        .select(col("rn"), col("e.item"), col("e.est"))
        .as[(Int, String, Long)].collect()
      assert(got.map { case (_, i, c) => i -> c }.toMap == expected)
      // best-first: (est desc, item asc) matches the rank column
      val ranked = expected.toSeq.sortBy { case (i, c) => (-c, i) }
      assert(got.sortBy(_._1).map { case (_, i, c) => (i, c) }.toSeq == ranked)
    }
  }

  test("emit truncates to the top entries only") {
    val got = (Seq.fill(9)("x") ++ Seq.fill(5)("y") ++ Seq("z")).toDF("item")
      .agg(HeavyHittersOps.heavyHitters(100, 2, col("item")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 9L), ("y", 5L)))
  }

  test("MG guarantee under capacity pressure: est <= true, true - est <= n/(cap+1), heavy keys retained") {
    val rnd = new Random(42)
    // zipfish stream over ~200 distinct keys, far beyond capacity 20
    val items = Seq.fill(5000)(s"k${(math.pow(rnd.nextDouble(), 3) * 200).toInt}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    val cap = 20
    for (parts <- Seq(1, 8)) {
      val got = items.toDF("item").repartition(parts)
        .agg(HeavyHittersOps.heavyHitters(cap, cap, col("item")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"))
        .as[(String, Long)].collect().toMap
      assert(got.size <= cap)
      val bound = n / (cap + 1)
      got.foreach { case (k, est) =>
        val t = truth(k)
        assert(est <= t, s"overestimate for $k: $est > $t")
        assert(t - est <= bound, s"error for $k beyond n/(cap+1): $t - $est > $bound")
      }
      // every key with true count > n/(cap+1) must survive
      truth.filter(_._2 > bound).keys.foreach { k =>
        assert(got.contains(k), s"heavy key $k (true=${truth(k)}) dropped at $parts parts")
      }
    }
  }

  test("driver-side buffer: stream add + pairwise absorb keep the merged MG bound") {
    val rnd = new Random(7)
    (0 until 10).foreach { trial =>
      val items = Seq.fill(800)(s"i${(math.pow(rnd.nextDouble(), 2) * 60).toInt}")
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cap = 8
      // split into 4 chunks, sketch each, merge pairwise (tree shape)
      val bufs = items.grouped(200).map { chunk =>
        val b = new MgBuffer(cap)
        chunk.foreach(b.add)
        b
      }.toSeq
      val merged = bufs.reduce { (a, b) => a.absorb(b); a }
      assert(merged.size <= cap)
      val bound = items.size.toLong / (cap + 1)
      merged.entries.foreach { case (k, est) =>
        assert(est <= truth(k) && truth(k) - est <= bound,
          s"trial $trial key $k est=$est true=${truth(k)} bound=$bound")
      }
      truth.filter(_._2 > bound).keys.foreach(k =>
        assert(merged.entries.contains(k), s"trial $trial heavy $k dropped"))
    }
  }

  test("null items are skipped; type mismatch is rejected") {
    val got = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("item")
      .agg(HeavyHittersOps.heavyHitters(10, 10, col("item")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
    intercept[Exception] {
      Seq(1L, 2L).toDF("item")
        .agg(HeavyHittersOps.heavyHitters(10, 10, col("item"))).collect()
    }
  }
}
