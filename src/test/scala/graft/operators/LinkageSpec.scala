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
}
