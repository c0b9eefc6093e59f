package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  /** The naive one-window global formulation — the semantics oracle the
    * bucketed two-pass plan must match bit-for-bit.
    */
  private def globalWindow(df: DataFrame, budget: Long): Set[Long] =
    df.withColumn("__run",
        sum(col("cost")).over(Window.orderBy(col("score").desc, col("id"))))
      .filter(col("__run") <= budget)
      .select("id").as[Long].collect().toSet

  private lazy val corpus = (0L until 500L).map { i =>
    // deliberately collision-heavy scores (41 distinct values over 500
    // rows) so bucket-edge and id-tiebreak handling is exercised
    (i, (i * i % 41).toDouble, 10L + i % 7)
  }.toDF("id", "score", "cost")

  test("bucketed selection equals the global window at several budgets and bucket counts") {
    for (budget <- Seq(0L, 137L, 1500L, 3000L, 100000L); buckets <- Seq(1, 7, 100)) {
      val got = Selection.selectUnderBudget(corpus, "id", "score", "cost",
        budget, buckets).select("id").as[Long].collect().toSet
      assert(got == globalWindow(corpus, budget),
        s"mismatch at budget=$budget buckets=$buckets")
    }
  }

  test("prefix semantics: the first over-budget row blocks everything after it") {
    val df = Seq((1L, 5.0, 6L), (2L, 4.0, 100L), (3L, 3.0, 1L))
      .toDF("id", "score", "cost")
    // id=2 crosses the 10-token budget, so id=3 is dropped too even
    // though its cost alone would fit (prefix, not knapsack)
    val kept = Selection.selectUnderBudget(df, "id", "score", "cost", 10L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("all-equal scores degenerate to the pure id-order prefix") {
    val df = (0L until 100L).map(i => (i, 1.0, 10L)).toDF("id", "score", "cost")
    val kept = Selection.selectUnderBudget(df, "id", "score", "cost", 55L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 4L)) // 5 docs of 10 tokens
  }

  test("grouped selection equals the per-domain window at several bucket counts") {
    val mixed = corpus.withColumn("domain",
      element_at(array(lit("a"), lit("b"), lit("c")), (col("id") % 3 + 1).cast("int")))
    val budgets = Map("a" -> 400L, "b" -> 1200L, "c" -> 100000L) // c fits whole
    val oracle = mixed.withColumn("__run",
        sum(col("cost")).over(Window.partitionBy(col("domain"))
          .orderBy(col("score").desc, col("id"))))
      .filter(col("__run") <= when(col("domain") === "a", 400L)
        .when(col("domain") === "b", 1200L).otherwise(100000L))
      .select("id").as[Long].collect().toSet
    for (buckets <- Seq(1, 7, 100)) {
      val got = Selection.selectUnderBudgetByGroup(mixed, "domain", "id",
        "score", "cost", budgets, buckets).select("id").as[Long].collect().toSet
      assert(got == oracle, s"mismatch at buckets=$buckets")
    }
  }

  test("domains without a budget entry are dropped") {
    val mixed = corpus.withColumn("domain",
      when(col("id") % 2 === 0, "known").otherwise("unknown"))
    val kept = Selection.selectUnderBudgetByGroup(mixed, "domain", "id",
      "score", "cost", Map("known" -> 100000L))
      .select("domain").distinct().as[String].collect().toSeq
    assert(kept == Seq("known"))
  }

  test("null and NaN scores are excluded; empty input returns empty") {
    val df = Seq((1L, Some(2.0), 5L), (2L, None, 5L), (3L, Some(Double.NaN), 5L))
      .toDF("id", "score", "cost")
    val kept = Selection.selectUnderBudget(df, "id", "score", "cost", 100L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
    val empty = Selection.selectUnderBudget(df.filter(lit(false)), "id", "score", "cost", 100L)
    assert(empty.count() == 0)
  }

  test("keepAboveQuantile gates each stratum at its own exact threshold") {
    val rows = Seq(
      ("en", 1L, 0.1), ("en", 2L, 0.2), ("en", 3L, 0.3), ("en", 4L, 0.4), ("en", 5L, 0.5),
      ("de", 6L, 10.0), ("de", 7L, 20.0), ("de", 8L, 30.0))
      .toDF("lang", "doc_id", "score")
    // en p50 over {.1...5} = 0.3 -> ids 3,4,5; de p50 over {10,20,30} = 20 -> 7,8
    val got = Selection.keepAboveQuantile(rows, "lang", "score", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L, 4L, 5L, 7L, 8L))
    // the approx variant agrees on well-separated data
    val approx = Selection.keepAboveQuantile(rows, "lang", "score", 0.5, exact = false)
      .select("doc_id").as[Long].collect().toSet
    assert(approx == got)
    intercept[IllegalArgumentException](
      Selection.keepAboveQuantile(rows, "lang", "score", 1.0))
  }

  test("topKPerGroup ranks (score desc, id asc), truncates to k, survives repartitioning") {
    val rows = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.7), ("en", 3L, 0.9),  // tie: id 1 before 3
      ("en", 4L, 0.1), ("de", 5L, 0.5))
      .toDF("lang", "doc_id", "score")
    val out = Selection.topKPerGroup(rows, "lang", "score", "doc_id", 3)
      .orderBy("lang", "rn").as[(String, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("de", 5L, 0.5, 1L),
      ("en", 1L, 0.9, 1L), ("en", 3L, 0.9, 2L), ("en", 2L, 0.7, 3L)))
    // bounded-heap partial aggregation: identical under any partitioning
    val re = Selection.topKPerGroup(rows.repartition(7), "lang", "score", "doc_id", 3)
      .orderBy("lang", "rn").as[(String, Long, Double, Long)].collect().toSeq
    assert(re == out)
  }

  test("rankFusion fuses truncated per-group lists with null ranks for absences") {
    // en: quality ranks 1,2,3 = ids 1,2,3; length ranks 1,2,3 = ids 3,2,1.
    // topK = 2 truncates each list, so id 3 is absent from the quality
    // list and id 1 absent from the length list.
    val rows = Seq(
      ("en", 1L, 0.9, 10.0), ("en", 2L, 0.8, 20.0), ("en", 3L, 0.7, 30.0),
      ("de", 4L, 0.5, 5.0))
      .toDF("lang", "doc_id", "quality", "length")
    val got = Selection.rankFusion(rows, "lang", "doc_id",
      Seq("quality", "length"), topK = 2)
      .orderBy("lang", "doc_id")
      .as[(String, Long, Option[Long], Option[Long], Double)].collect().toSeq
    def rrf(r1: Option[Long], r2: Option[Long]): Double = {
      val s = r1.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        r2.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == Seq(
      ("de", 4L, Some(1L), Some(1L), rrf(Some(1L), Some(1L))),
      ("en", 1L, Some(1L), None, rrf(Some(1L), None)),
      ("en", 2L, Some(2L), Some(2L), rrf(Some(2L), Some(2L))),
      ("en", 3L, None, Some(1L), rrf(None, Some(1L)))))
    // a doc on both lists outscores a doc leading only one list
    val m = got.map(r => (r._1, r._2) -> r._5).toMap
    assert(m(("en", 2L)) > m(("en", 1L)))
    intercept[IllegalArgumentException](
      Selection.rankFusion(rows, "lang", "doc_id", Seq.empty, 2))
    intercept[IllegalArgumentException](
      Selection.rankFusion(rows, "lang", "doc_id", Seq("quality"), 0))
  }

  test("conformalCoverageReport matches the driver-side split+quantile reference") {
    val rows = (0L until 200L).map(i => (i, (i % 97).toDouble / 97.0)).toDF("id", "score")
    val got = Selection.conformalCoverageReport(rows, "id", "score",
      calibPermille = 500, keepQuantile = 0.8).head()
    // reference: same md5 permille split, Spark-style interpolated
    // percentile, coverage against the 9-dp-quantized threshold
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"conf$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000L
    }
    val scores = (0L until 200L).map(i => i -> (i % 97).toDouble / 97.0)
    val (calib, eval_) = scores.partition { case (id, _) => bucket(id) < 500 }
    val cs = calib.map(_._2).sorted
    val h = (cs.size - 1) * 0.8
    val lo = math.floor(h).toInt
    val thr = cs(lo) + (h - lo) * (cs(math.ceil(h).toInt) - cs(lo))
    val thr9 = BigDecimal(thr).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kept = eval_.count(_._2 >= thr9)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == calib.size.toLong && got.getLong(1) == eval_.size.toLong)
    assert(got.getDouble(2) == r6(thr))
    assert(got.getDouble(3) == 0.2)
    assert(got.getDouble(4) == r6(kept.toDouble / eval_.size.toDouble))
    assert(got.getDouble(5) == r6(kept.toDouble / eval_.size.toDouble - (1.0 - 0.8)))
    // with ~uniform scores the out-of-sample keep rate lands near target
    assert(math.abs(got.getDouble(5)) < 0.1)
    // the approx arm keeps the same report shape and a nearby threshold
    val approx = Selection.conformalCoverageReport(rows, "id", "score",
      calibPermille = 500, keepQuantile = 0.8, exact = false).head()
    assert(math.abs(approx.getDouble(2) - got.getDouble(2)) < 0.05)
    intercept[IllegalArgumentException](
      Selection.conformalCoverageReport(rows, "id", "score", 0, 0.8))
    intercept[IllegalArgumentException](
      Selection.conformalCoverageReport(rows, "id", "score", 500, 1.0))
  }

  test("curriculumOrder: easiest-first per group, arithmetic round-robin interleave") {
    val rows = Seq(
      ("a", 10L, 3.0), ("a", 11L, 1.0), ("a", 12L, 2.0),
      ("b", 20L, 9.0), ("b", 21L, 5.0))
    val df = (rows.map { case (g, i, v) => (g, i, Some(v)) } :+
      (("a", 13L, Option.empty[Double]))).toDF("g", "id", "score")
    val out = Selection.curriculumOrder(df, "id", "score", "g")
      .select("g", "id", "rank_in_group", "position")
      .as[(String, Long, Long, Long)].collect().sortBy(_._4)
    // null-score row dropped
    assert(!out.exists(_._2 == 13L))
    // within-group order: easiest (smallest score) first
    assert(out.filter(_._1 == "a").sortBy(_._3).map(_._2).toSeq == Seq(11L, 12L, 10L))
    assert(out.filter(_._1 == "b").sortBy(_._3).map(_._2).toSeq == Seq(21L, 20L))
    // interleave: positions cycle a, b, a, b, a (gidx: a=0, b=1; G=2)
    assert(out.map(t => (t._4, t._1)).toSeq ==
      Seq((0L, "a"), (1L, "b"), (2L, "a"), (3L, "b"), (4L, "a")))
    // positions are collision-free and strictly increasing in rank per group
    assert(out.map(_._4).distinct.length == out.length)
  }

  test("rrfFuseRanks: fixed-order fusion, missing-list zero term, guards") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dense = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("q", "id", "rn")
    val sparse = Seq((1L, 101L, 1L), (1L, 102L, 2L)).toDF("q", "id", "rn")
    val got = Selection.rrfFuseRanks(Seq(dense, sparse), "q", "id", "rn")
      .select("q", "id", "rank_1", "rank_2", "rrf")
      .collect()
      .map(r => (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getDouble(4)))
      .sortBy(_._1)
    // 100: dense-only → sparse term contributes exactly 0
    assert(got(0) == ((100L, Some(1L), None, r6(1.0 / 61.0))))
    // 101: both lists, dense term first in the fixed-order sum
    assert(got(1) == ((101L, Some(2L), Some(1L), r6(1.0 / 62.0 + 1.0 / 61.0))))
    // 102: sparse-only
    assert(got(2) == ((102L, None, Some(2L), r6(1.0 / 62.0))))

    // a single list fuses to its own reciprocal ranks
    val solo = Selection.rrfFuseRanks(Seq(dense), "q", "id", "rn")
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(solo == Map(100L -> r6(1.0 / 61.0), 101L -> r6(1.0 / 62.0)))

    intercept[IllegalArgumentException](
      Selection.rrfFuseRanks(Seq.empty, "q", "id", "rn"))
    intercept[IllegalArgumentException](
      Selection.rrfFuseRanks(Seq(dense), "q", "id", "rn", k0 = 0))
  }

  test("rrfFuseRanksWeighted: hand coefficients; all-ones IS rrfFuseRanks; guards") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dense = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("q", "id", "rn")
    val sparse = Seq((1L, 101L, 1L), (1L, 102L, 2L)).toDF("q", "id", "rn")
    val got = Selection.rrfFuseRanksWeighted(Seq(dense, sparse), "q", "id",
      "rn", weights = Seq(0.7, 0.3))
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(got == Map(
      100L -> r6(0.7 / 61.0),
      101L -> r6(0.7 / 62.0 + 0.3 / 61.0),
      102L -> r6(0.3 / 62.0)))
    // the unit form IS rrfFuseRanks — one fusion tail by construction
    val unit = Selection.rrfFuseRanksWeighted(Seq(dense, sparse), "q", "id",
      "rn", weights = Seq(1.0, 1.0))
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    val plain = Selection.rrfFuseRanks(Seq(dense, sparse), "q", "id", "rn")
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(unit == plain)
    intercept[IllegalArgumentException](
      Selection.rrfFuseRanksWeighted(Seq(dense, sparse), "q", "id", "rn",
        weights = Seq(0.7)))
    intercept[IllegalArgumentException](
      Selection.rrfFuseRanksWeighted(Seq(dense, sparse), "q", "id", "rn",
        weights = Seq(0.7, -0.3)))
  }

  test("fuseScoresMinMax: hand CombSUM/CombMNZ, per-group normalization, degenerate lists") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // list A: scores 10/5/0 → normalize 1.0 / 0.5 / 0.0
    val a = Seq((1L, 100L, 10.0), (1L, 101L, 5.0), (1L, 102L, 0.0))
      .toDF("q", "id", "s")
    // list B: scores 2/1 → normalize 1.0 / 0.0
    val b = Seq((1L, 101L, 2.0), (1L, 103L, 1.0)).toDF("q", "id", "s")
    val mnz = Selection.fuseScoresMinMax(Seq(a, b), "q", "id", "s")
      .select("id", "n_lists", "fused")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(mnz == Map(
      100L -> ((1L, r6(1.0))),          // A-only: 1.0 × 1 list
      101L -> ((2L, r6((0.5 + 1.0) * 2))), // both lists, agreement ×2
      102L -> ((1L, r6(0.0))),          // A's min normalizes to 0
      103L -> ((1L, r6(0.0)))))         // B's min
    // CombSUM: no agreement multiplier
    val sum = Selection.fuseScoresMinMax(Seq(a, b), "q", "id", "s", mnz = false)
      .select("id", "fused").as[(Long, Double)].collect().toMap
    assert(sum(101L) == r6(0.5 + 1.0))
    // single-row and constant-score lists normalize to 1.0 (present
    // beats absent), and normalization is PER GROUP
    val c = Seq((1L, 100L, 7.0), (2L, 200L, 3.0), (2L, 201L, 3.0))
      .toDF("q", "id", "s")
    val solo = Selection.fuseScoresMinMax(Seq(c), "q", "id", "s")
      .select("id", "fused").as[(Long, Double)].collect().toMap
    assert(solo == Map(100L -> 1.0, 200L -> 1.0, 201L -> 1.0))
    intercept[IllegalArgumentException](
      Selection.fuseScoresMinMax(Seq.empty, "q", "id", "s"))
  }

  test("rankedEvalReport: hand MRR/nDCG, zero-hit query, beyond-k run rows ignored") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(r: Int): Double = r6(1.0 / (math.log(r + 1.0) / math.log(2.0)))
    // gold q1: a,b,c at ranks 1..3; run q1: b first, miss at 2, a third,
    // c only at rank 4 (ignored at k=3)
    val gold = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L)).toDF("q", "id", "rn")
    val run = Seq((1L, 11L, 1L), (1L, 99L, 2L), (1L, 10L, 3L), (1L, 12L, 4L),
      (2L, 98L, 1L)).toDF("q", "id", "rn")
    val got = Selection.rankedEvalReport(gold, "q", "id", "rn",
      run, "q", "id", "rn", k = 3)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // q1: hits b@1, a@3 → n_hit 2, mrr 1/1, ndcg (t1+t3)/(t1+t2+t3)
    val exp1 = r6((term(1) + term(3)) / (term(1) + term(2) + term(3)))
    assert(got(0) == ((1L, 2L, 1.0, exp1)))
    // q2: zero hits → mrr 0, ndcg 0
    assert(got(1) == ((2L, 0L, 0.0, 0.0)))
    intercept[IllegalArgumentException](
      Selection.rankedEvalReport(gold, "q", "id", "rn",
        run, "q", "id", "rn", k = 0))
  }
}
