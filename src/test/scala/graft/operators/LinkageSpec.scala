package graft.operators

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "jonathan smith"),
    (2L, "maria garcia"),
    (3L, "wei chen")
  ).toDF("id", "name")

  test("fuzzyJoin finds edit-distance matches via shared trigrams, exact dist out") {
    val right = Seq(
      (10L, "jonathon smith"), // 1 substitution from id 1
      (11L, "maria garcia"),   // exact copy of id 2
      (12L, "xavier quinn")    // unrelated
    ).toDF("rid", "rname")
    val out = Linkage.fuzzyJoin(left, right, "id", "name", "rid", "rname",
      maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 10L, 1), (2L, 11L, 0)))
  }

  test("stop-gram cap: pairs whose only shared grams are ubiquitous are not candidates") {
    // the ONLY gram the right string shares with any left string is the
    // ubiquitous filler "aaa" (left df = 3 > 1 → stop-gram), so despite
    // edit distance 1 the pair is never compared — the documented recall
    // bound of q-gram blocking
    val l = Seq((1L, "aaaaaaX"), (2L, "aaaaaaY"), (3L, "aaaaaaZ")).toDF("id", "name")
    val r = Seq((10L, "aaaaaa")).toDF("rid", "rname")
    val blocked = Linkage.fuzzyJoin(l, r, "id", "name", "rid", "rname",
      maxDist = 2, maxGramDf = 1)
      .as[(Long, Long, Int)].collect()
    assert(blocked.isEmpty)
    // raising the cap restores the matches (the gram passes the df filter)
    val open = Linkage.fuzzyJoin(l, r, "id", "name", "rid", "rname",
      maxDist = 2, maxGramDf = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(open == Set((1L, 10L, 1), (2L, 10L, 1), (3L, 10L, 1)))
  }

  test("strings shorter than q produce no grams (sequence() descending-range guard)") {
    val l = Seq((1L, "ab")).toDF("id", "name")
    val r = Seq((10L, "ab")).toDF("rid", "rname")
    val out = Linkage.fuzzyJoin(l, r, "id", "name", "rid", "rname", maxDist = 0)
    assert(out.collect().isEmpty)
  }

  test("argument validation") {
    val r = Seq((10L, "abc")).toDF("rid", "rname")
    intercept[IllegalArgumentException](
      Linkage.fuzzyJoin(left, r, "id", "name", "rid", "rname", maxDist = -1))
    intercept[IllegalArgumentException](
      Linkage.fuzzyJoin(left, r, "id", "name", "rid", "rname", 1, q = 0))
    intercept[IllegalArgumentException](
      Linkage.fuzzyJoin(left, r, "id", "name", "rid", "rname", 1, maxGramDf = 0))
  }

  test("sortedNeighborhood matches the brute-force blocked-rank reference") {
    val rnd = new scala.util.Random(42)
    val base = Seq("alpha corp", "alpha corpn", "alpha crop", "beta llc",
      "beta lc", "gamma inc", "gamma incorporated", "delta co")
    val rows = (0 until 60).map { i =>
      val s = base(rnd.nextInt(base.size))
      val mut = if (rnd.nextBoolean()) s.updated(rnd.nextInt(s.length),
        ('a' + rnd.nextInt(26)).toChar) else s
      (i.toLong, mut)
    }
    val (window, prefixLen, maxDist) = (3, 4, 4)
    val got = Linkage.sortedNeighborhood(rows.toDF("id", "key"), "id", "key",
      window, prefixLen, maxDist)
      .as[(Long, Long, Int)].collect().toSet

    // reference: rank by (key, id) within prefix blocks, all pairs with
    // rank diff in (0, window], Levenshtein on the full keys
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val exp = rows.groupBy(_._2.take(prefixLen)).values.flatMap { blk =>
      val ranked = blk.sortBy(r => (r._2, r._1)).zipWithIndex
      for {
        (ra, ia) <- ranked; (rb, ib) <- ranked
        if ib > ia && ib - ia <= window
        d = lev(ra._2, rb._2) if d <= maxDist
      } yield (ra._1, rb._1, d)
    }.toSet
    assert(got == exp)
    assert(got.nonEmpty)
    intercept[IllegalArgumentException](
      Linkage.sortedNeighborhood(rows.toDF("id", "key"), "id", "key",
        0, prefixLen, maxDist))
  }
}
