package graft.engine

import java.sql.Date

import org.apache.spark.sql.functions.{col, lit, when}

import graft.SparkSpec

class SummariesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val hist = Seq(
    Score(d("2024-01-01"), "CVE-A", 0.10, 0.5),
    Score(d("2024-01-02"), "CVE-A", 0.20, 0.5),
    Score(d("2024-01-04"), "CVE-A", 0.40, 0.5), // day 3 missing
    Score(d("2024-01-08"), "CVE-A", 0.80, 0.5)
  ).toDF()

  test("lookbackByDays picks the value exactly k calendar days back (null when missing)") {
    val out = Summaries.lookbackByDays(hist, "cve", "date", "epss", Seq(1, 7))
      .orderBy("date")
      .select($"date".cast("string"), $"epss_1d_ago", $"epss_7d_ago")
      .as[(String, Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", None, None),
      ("2024-01-02", Some(0.10), None),
      ("2024-01-04", None, None),           // 01-03 snapshot missing
      ("2024-01-08", None, Some(0.10))))
  }

  test("rejigPrecision rounds all float columns to n digits (P7, util.py:181-189)") {
    val df = Seq((1L, 0.123456789, 0.987654321)).toDF("id", "a", "b")
    val out = Summaries.rejigPrecision(df, 5).as[(Long, Double, Double)].head()
    assert(out == ((1L, 0.12346, 0.98765)))
    val only = Summaries.rejigPrecision(df, 2, Some(Seq("a"))).as[(Long, Double, Double)].head()
    assert(only == ((1L, 0.12, 0.987654321)))
  }

  test("perKey summary is deterministic via min_by/max_by on the order column") {
    val out = Summaries.perKey(hist, "cve", "date", "epss").collect()(0)
    assert(out.getAs[Double]("first_value") == 0.10)
    assert(out.getAs[Double]("last_value") == 0.80)
    assert(out.getAs[Long]("n_rows") == 4L)
  }

  test("quantiles: approx_percentile sketch tracks the exact per-group percentiles") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val q = Summaries.quantiles(li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.95))
      .collect()
    assert(q.length == 3)
    q.foreach { r =>
      val exact = r.getSeq[Double](1); val approx = r.getSeq[Double](2)
      exact.zip(approx).foreach { case (e, a) =>
        assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e") }
    }
  }

  test("trending keeps keys whose value rose by the threshold; lastBigChange finds the latest big step") {
    val ev = Seq(
      (1L, 1L, 10.0), (2L, 1L, 15.0), (3L, 1L, 90.0),  // user 1: +80, big step at event 3
      (4L, 2L, 50.0), (5L, 2L, 52.0),                  // user 2: +2
      (6L, 3L, 40.0), (7L, 3L, 20.0)                   // user 3: falling
    ).toDF("event_id", "user_id", "value")
    val tr = Summaries.trending(ev, "user_id", "event_id", "value", 10.0)
      .select("user_id", "delta").as[(Long, Double)].collect().toMap
    assert(tr == Map(1L -> 80.0))
    val big = Summaries.lastBigChange(ev, "user_id", "event_id", "value", 20.0)
      .select("user_id", "last_change_at", "last_change")
      .as[(Long, Long, Double)].collect().toSet
    assert(big == Set((1L, 3L, 75.0), (3L, 7L, -20.0)))
  }

  test("retentionCohorts: first-seen cohorts, dedup within a day, offset 0 = cohort size") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: first seen day 1, active again day 2 (twice -> counts once) and day 4
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 21:00:00")), (1L, ts("2024-01-04 10:00:00")),
      // user 2: first seen day 1 only
      (2L, ts("2024-01-01 12:00:00")),
      // user 3: first seen day 2, active day 3
      (3L, ts("2024-01-02 07:00:00")), (3L, ts("2024-01-03 07:00:00"))
    ).toDF("user_id", "ts")
    val out = Summaries.retentionCohorts(ev, "user_id", "ts")
      .orderBy("cohort", "day_offset")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
      .map { case (c, o, n) => (c.toString, o, n) }
    assert(out == Seq(
      ("2024-01-01", 0L, 2L),   // users 1 and 2
      ("2024-01-01", 1L, 1L),   // user 1 on day 2 (deduped within the day)
      ("2024-01-01", 3L, 1L),   // user 1 on day 4
      ("2024-01-02", 0L, 1L),   // user 3's cohort
      ("2024-01-02", 1L, 1L)))  // user 3 on day 3
  }

  test("funnel: strict order, earliest completion, nulls cascade on break") {
    val ev = Seq(
      // user 1 completes A->B->C in order, with an earlier decoy B at id 1
      (1L, 1L, "B"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "C"),
      // user 2: C happens BEFORE B completes -> stops at 2 steps
      (2L, 1L, "A"), (2L, 2L, "C"), (2L, 3L, "B"),
      // user 3: only A
      (3L, 9L, "A"),
      // user 4: never does A -> absent
      (4L, 1L, "B"), (4L, 2L, "C")
    ).toDF("user_id", "event_id", "event_type")
    val out = Summaries.funnel(ev, "user_id", "event_type", "event_id", Seq("A", "B", "C"))
      .orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    assert(out == Seq(
      (1L, Some(2L), Some(3L), Some(4L), 3L),   // decoy B at id 1 ignored (before A)
      (2L, Some(1L), Some(3L), None, 2L),       // C at id 2 precedes B at id 3
      (3L, Some(9L), None, None, 1L)))
  }

  test("funnel tolerates input columns named like its working columns (ADVICE r8)") {
    // an input already carrying step_1 / __o must not trip
    // ambiguous-reference analysis errors — funnel projects only the
    // three columns it reads at entry
    val ev = Seq(
      (1L, 1L, "A", 99L, 98L), (1L, 2L, "B", 99L, 98L)
    ).toDF("user_id", "event_id", "event_type", "step_1", "__o")
    val out = Summaries.funnel(ev, "user_id", "event_type", "event_id", Seq("A", "B"))
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSeq
    assert(out == Seq((1L, Some(1L), Some(2L), 2L)))
  }

  test("transitionMatrix counts adjacent pairs per key and row-normalizes exactly") {
    // user 1: a b a b → a→b, b→a, a→b; user 2: a a c → a→a, a→c
    // prev-a total = 4 (prob 2/4, 1/4, 1/4), prev-b total = 1 (prob 1)
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "c")
    ).toDF("user_id", "event_id", "event_type")
    val out = Summaries.transitionMatrix(ev, "user_id", "event_type", Seq("event_id"))
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "a", 1L, 0.25),
      ("a", "b", 2L, 0.5),
      ("a", "c", 1L, 0.25),
      ("b", "a", 1L, 1.0)))
    // single-event keys contribute no transitions
    val solo = Summaries.transitionMatrix(
      Seq((9L, 1L, "x")).toDF("user_id", "event_id", "event_type"),
      "user_id", "event_type", Seq("event_id"))
    assert(solo.count() == 0)
  }

  test("madOutliers flags by robust z-score; MAD=0 groups flag deviants, not duplicates") {
    val df = Seq(
      // group a: median 3, MAD 1 → only 100 crosses z=3 (score 97/1.4826)
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 100.0),
      // group b: median 5, MAD 0 → the 9 flags with a NULL score (the
      // z-scale is undefined); the exact-median rows never flag
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0), ("b", 9L, 9.0)
    ).toDF("g", "id", "v")
    val out = Summaries.madOutliers(df, "g", "v", z = 3.0)
      .select("g", "id", "v", "score")
      .orderBy("id")
      .as[(String, Long, Double, Option[Double])].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq(("a", 5L), ("b", 9L)))
    assert(math.abs(out.head._4.get - 97.0 / 1.4826) < 1e-6)
    assert(out(1)._4.isEmpty)
    intercept[IllegalArgumentException](Summaries.madOutliers(df, "g", "v", 0.0))
  }

  test("equiDepthHistogram: equal counts, exact quartile boundaries, observed ranges") {
    // values 1..100: quartile boundaries 25.75 / 50.5 / 75.25 → buckets
    // of exactly 25; lo/hi are the observed extremes of each bucket
    val df = spark.range(1, 101).select($"id".cast("double").as("v"))
    val out = Summaries.equiDepthHistogram(df, "v", nBuckets = 4)
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 25L, 1.0, 25.0),
      (1L, 25L, 26.0, 50.0),
      (2L, 25L, 51.0, 75.0),
      (3L, 25L, 76.0, 100.0)))
    intercept[IllegalArgumentException](Summaries.equiDepthHistogram(df, "v", 1))
  }

  test("sessionize splits at the gap, indexes 1-based, reports exact µs durations") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: two sessions (gap 3 h > 1 h), second single-event
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 00:30:00"), 11L),
      (1L, ts("2024-01-01 00:59:30.5"), 12L),
      (1L, ts("2024-01-01 04:00:00"), 13L),
      // user 2: one session, ts tie broken by event id
      (2L, ts("2024-01-01 12:00:00"), 21L),
      (2L, ts("2024-01-01 12:00:00"), 20L)
    ).toDF("user_id", "ts", "event_id")
    val out = Summaries.sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 3600)
      .orderBy("user_id", "session_idx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 3L, 10L, 3570500000L), // 59 min 30.5 s in µs, exact
      (1L, 2L, 1L, 13L, 0L),
      (2L, 1L, 2L, 20L, 0L)))
    intercept[IllegalArgumentException](
      Summaries.sessionize(ev, "user_id", "ts", "event_id", 0))
  }

  test("decayedScore: exact dyadic weights from the corpus max date") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-15 10:00:00"), 8.0),  // day 0 → w = 1
      (1L, ts("2024-01-08 10:00:00"), 8.0),  // 7 days → w = 0.5
      (1L, ts("2024-01-01 10:00:00"), 8.0),  // 14 days → w = 0.25
      (2L, ts("2024-01-02 23:59:59"), 4.0)   // 13 days → ⌊13/7⌋ = 1 → w = 0.5
    ).toDF("user_id", "ts", "value")
    val out = Summaries.decayedScore(ev, "user_id", "ts", "value", halfLifeDays = 7)
      .orderBy("user_id")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 8.0 + 4.0 + 2.0, 3L, 0L),
      (2L, 2.0, 1L, 13L)))
    intercept[IllegalArgumentException](
      Summaries.decayedScore(ev, "user_id", "ts", "value", 0))
  }

  test("sequenceAnomaly: avg NLL matches a driver-side reference fold") {
    // user 1 follows the dominant a→b→a pattern; user 2 takes the rare
    // a→c edge — its avg NLL must be strictly higher
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "b", 4L),
      (2L, "a", 1L), (2L, "c", 2L),
      (3L, "a", 1L), (3L, "b", 2L)
    ).toDF("user_id", "event_type", "event_id")
    val out = Summaries.sequenceAnomaly(ev, "user_id", "event_type", Seq("event_id"))
      .orderBy("user_id")
      .as[(Long, Long, Double)].collect().toSeq
    // global pairs: a→b ×3, b→a ×1, a→c ×1 → P(b|a)=3/4, P(a|b)=1, P(c|a)=1/4
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pba = 3.0 / 4
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out(0)._2 == 3L)
    assert(out(0)._3 == r6((-math.log(pba) * 2 + -math.log(1.0)) / 3))
    assert(out(1)._3 == r6(-math.log(1.0 / 4)))
    assert(out(2)._3 == r6(-math.log(pba)))
    assert(out(1)._3 > out(0)._3 && out(1)._3 > out(2)._3,
      "the rare-edge user must be the anomaly")
  }

  test("dailySpikes: z-scores from integer rolling sums; zero-variance flags deviants") {
    import java.sql.Timestamp
    // type A: 7 flat days of 10 then a burst of 40 (zero variance window
    // → NULL score, flagged); type B: 4,6,4,6,4,6,4 then 5 (variance > 0,
    // z = 0 exactly at the mean, not flagged), then 20 (clear spike)
    def ev(tpe: String, day: Int, cnt: Int) = (0 until cnt).map(i =>
      (tpe, Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00"), i))
    val a = (1 to 7).flatMap(d => ev("A", d, 10)) ++ ev("A", 8, 40)
    val bCounts = Seq(4, 6, 4, 6, 4, 6, 4, 5, 20)
    val b = bCounts.zipWithIndex.flatMap { case (c, i) => ev("B", i + 1, c) }
    val df = (a ++ b).toDF("event_type", "ts", "i")
    val out = Summaries.dailySpikes(df, "event_type", "ts", lookback = 7, z = 2.0)
      .orderBy("event_type", "day")
      .select($"event_type", $"day".cast("string"), $"n", $"zscore", $"is_spike")
      .as[(String, String, Long, Option[Double], Int)].collect().toSeq
    // only days with a FULL 7-day lookback appear
    assert(out.map(r => (r._1, r._2)) == Seq(
      ("A", "2024-01-08"), ("B", "2024-01-08"), ("B", "2024-01-09")))
    val aRow = out.head
    assert(aRow._3 == 40L && aRow._4.isEmpty && aRow._5 == 1,
      s"zero-variance burst must flag with NULL score: $aRow")
    // B day 8: window 4,6,4,6,4,6,4 → sum 34, sumsq 172; mean 34/7,
    // var (172-34²/7)/6, z = (5 - 34/7)/sqrt(var)
    val mean = 34.0 / 7
    val std = math.sqrt((172.0 - 34.0 * 34.0 / 7) / 6)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1)._4.contains(r6((5 - mean) / std)) && out(1)._5 == 0)
    // B day 9: window 6,4,6,4,6,4,5 (rolling) → clearly spiking at 20
    assert(out(2)._3 == 20L && out(2)._5 == 1)
    intercept[IllegalArgumentException](
      Summaries.dailySpikes(df, "event_type", "ts", lookback = 1))
    intercept[IllegalArgumentException](
      Summaries.dailySpikes(df, "event_type", "ts", 7, z = 0.0))
  }

  test("trendSlopes: exact OLS on a perfect line; degenerate groups go NULL") {
    import java.sql.Timestamp
    def ev(tpe: String, day: Int, cnt: Int) = (0 until cnt).map(i =>
      (tpe, Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00"), i))
    val df = (
      (1 to 5).flatMap(d => ev("up", d, 2 * d + 3)) ++  // y = 2x + 5 exactly
        (1 to 4).flatMap(d => ev("flat", d, 7)) ++       // zero count variance
        ev("one", 1, 9)                                  // single day
      ).toDF("event_type", "ts", "i")
    val out = Summaries.trendSlopes(df, "event_type", "ts")
      .orderBy("event_type")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      ("flat", 4L, Some(0.0), None),     // dyy = 0 → r² undefined
      ("one", 1L, None, None),           // dxx = 0 → both undefined
      ("up", 5L, Some(2.0), Some(1.0))))
  }

  test("quantileTransform maps values onto their quantile grid, keeping all columns") {
    val df = spark.range(1, 101)
      .select($"id", $"id".cast("double").as("v"))
    val out = Summaries.quantileTransform(df, "v", nBuckets = 4)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    // same quartile boundaries as the histogram test: 25.75/50.5/75.25
    assert(out.take(25).forall(_._3 == 0.0))
    assert(out.slice(25, 50).forall(_._3 == 0.25))
    assert(out.slice(50, 75).forall(_._3 == 0.5))
    assert(out.drop(75).forall(_._3 == 0.75))
    assert(out.map(_._1) == (1L to 100L))
  }

  test("pearsonByGroup: exact lines, anti-correlation, degenerate NULLs, covariance") {
    val df = Seq(
      // up: y = 2x+1 → r = 1; cov of x={1,2,3}, y={3,5,7}: Σxy=34,
      // dxy = 3·34 − 6·15 = 12, cov = 12/(3·2) = 2
      ("up", 1L, 3L), ("up", 2L, 5L), ("up", 3L, 7L),
      // down: y = −x → r = −1
      ("down", 1L, -1L), ("down", 2L, -2L), ("down", 3L, -3L),
      // flat: zero y-variance → r NULL, cov 0
      ("flat", 1L, 9L), ("flat", 2L, 9L),
      // single: n < 2 → both NULL
      ("single", 5L, 5L))
      .toDF("g", "x", "y")
    val got = Summaries.pearsonByGroup(df, "g", "x", "y")
      .orderBy("g").as[(String, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("down", 3L, Some(-1.0), Some(-1.0)),
      ("flat", 2L, None, Some(0.0)),
      ("single", 1L, None, None),
      ("up", 3L, Some(1.0), Some(2.0))))
  }

  test("trimmedStats keeps the exact inter-quantile slice and its order-free mean") {
    // 1..100: p5 = 5.95, p95 = 95.05 (linear interpolation) → keep 6..95
    val df = spark.range(1, 101)
      .select(lit("g").as("g"), col("id").cast("double").as("v"))
    val got = Summaries.trimmedStats(df, "g", "v", lo = 0.05, hi = 0.95)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("g", 90L, 50.5, 6.0, 95.0)))
    // a wild outlier cannot move the trimmed mean of the same slice
    val withOutlier = df.unionByName(
      Seq(("g", 1e9)).toDF("g", "v"))
    val rob = Summaries.trimmedStats(withOutlier, "g", "v", 0.05, 0.95)
      .as[(String, Long, Double, Double, Double)].head()
    assert(rob._3 < 52.0, s"trimmed mean moved: ${rob._3}")
    intercept[IllegalArgumentException](Summaries.trimmedStats(df, "g", "v", 0.9, 0.1))
  }

  // ── the approx (corpus-scale) quantile arms: same answers as the exact
  // DuckDB-oracle arms on a skewed heavy-tail fixture, within the
  // sketch's rank-error bound. Fixture: 1000 DISTINCT cubes (heavy right
  // tail — the top decile spans 73% of the value range), accuracy well
  // above n so the sketch's only deviation is boundary-on-data-value
  // versus interpolated-between-values.
  private lazy val skewed = spark.range(1, 1001)
    .select(col("id"), (col("id") * col("id") * col("id")).cast("double").as("v"))

  test("equiDepthHistogram approx arm: near-equal depths on the skewed fixture") {
    val exact = Summaries.equiDepthHistogram(skewed, "v", nBuckets = 10)
      .orderBy("bucket").as[(Long, Long, Double, Double)].collect().toSeq
    val approx = Summaries.equiDepthHistogram(skewed, "v", nBuckets = 10,
      exact = false).orderBy("bucket").as[(Long, Long, Double, Double)].collect().toSeq
    assert(exact.map(_._2) == Seq.fill(10)(100L)) // exact arm: perfectly equal
    assert(approx.map(_._1) == (0L until 10L))
    assert(approx.map(_._2).sum == 1000L)          // no rows lost or duplicated
    approx.foreach { case (b, n, _, _) =>
      assert(math.abs(n - 100L) <= 5, s"bucket $b depth $n drifted > 5 rows") }
  }

  test("quantileTransform approx arm: qrank within one grid step of exact") {
    val e = Summaries.quantileTransform(skewed, "v", nBuckets = 20)
      .select(col("id"), col("qrank").as("qe"))
    val a = Summaries.quantileTransform(skewed, "v", nBuckets = 20, exact = false)
      .select(col("id"), col("qrank").as("qa"))
    val drift = e.join(a, "id")
      .select(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.abs(col("qe") - col("qa"))))
      .as[Double].head()
    assert(drift <= 0.05 + 1e-12, s"qrank drifted $drift > one 1/20 grid step")
  }

  test("trimmedStats approx arm: same slice within rank tolerance, robust mean holds") {
    val grouped = skewed.select(lit("g").as("g"), col("v"))
    val e = Summaries.trimmedStats(grouped, "g", "v", 0.05, 0.95)
      .as[(String, Long, Double, Double, Double)].head()
    val a = Summaries.trimmedStats(grouped, "g", "v", 0.05, 0.95, exact = false)
      .as[(String, Long, Double, Double, Double)].head()
    assert(math.abs(a._2 - e._2) <= 10, s"n_kept ${a._2} vs ${e._2}")
    // heavy tail: the mean is dominated by the top of the kept slice, so
    // compare relatively, not absolutely
    assert(math.abs(a._3 - e._3) / e._3 < 0.05, s"trimmed_mean ${a._3} vs ${e._3}")
  }

  test("madOutliers approx arm: identical flag set when outliers are well separated") {
    val df = Seq.tabulate(50)(i => ("a", i.toLong, (i % 10).toDouble + 1.0)) ++
      Seq(("a", 98L, 500.0), ("a", 99L, 800.0))
    val base = df.toDF("g", "id", "v")
    val e = Summaries.madOutliers(base, "g", "v", z = 3.0)
      .select("id").as[Long].collect().toSet
    val a = Summaries.madOutliers(base, "g", "v", z = 3.0, exact = false)
      .select("id").as[Long].collect().toSet
    assert(e == Set(98L, 99L))
    assert(a == e, s"approx flagged $a, exact flagged $e")
  }

  test("quantileTransformByGroup ranks each row against ITS group's grid") {
    // group a: 1..4 → quartile bounds 1.75/2.5/3.25; group b: 10..40 —
    // the same absolute value lands on different ranks per group
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("b", 5L, 10.0), ("b", 6L, 20.0), ("b", 7L, 30.0), ("b", 8L, 40.0))
      .toDF("g", "id", "v")
    val got = Summaries.quantileTransformByGroup(df, "g", "v", nBuckets = 4)
      .orderBy("id").as[(String, Long, Double, Double)].collect().toSeq
    assert(got.map(_._4) == Seq(0.0, 0.25, 0.5, 0.75, 0.0, 0.25, 0.5, 0.75))
    // approx arm agrees within one grid step on the skewed fixture
    val grouped = skewed.select((col("id") % 3).cast("string").as("g"),
      col("id"), col("v"))
    val e = Summaries.quantileTransformByGroup(grouped, "g", "v", 20)
      .select(col("id"), col("qrank").as("qe"))
    val a = Summaries.quantileTransformByGroup(grouped, "g", "v", 20, exact = false)
      .select(col("id"), col("qrank").as("qa"))
    val drift = e.join(a, "id")
      .select(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.abs(col("qe") - col("qa"))))
      .as[Double].head()
    assert(drift <= 0.05 + 1e-12, s"per-group qrank drifted $drift")
    intercept[IllegalArgumentException](
      Summaries.quantileTransformByGroup(df, "g", "v", 1))
  }

  test("sort-assisted exact boundaries agree with percentile() to the bucket") {
    // the exact arm's distributed-sort path states quantile_cont's
    // interpolation directly; Spark's percentile() aggregate states the
    // same formula internally — the two must agree within an ulp, which
    // bucket assignment then makes EXACTLY equal (boundaries sit strictly
    // between data values on this fixture)
    val df = skewed // 1000 distinct cubes, heavy tail
    val viaSort = Summaries.equiDepthHistogram(df, "v", nBuckets = 8)
      .orderBy("bucket").as[(Long, Long, Double, Double)].collect().toSeq
    val ps = (1 until 8).map(_.toDouble / 8)
    val viaAgg = df.agg(
      org.apache.spark.sql.functions.expr(
        s"percentile(`v`, array(${ps.mkString(",")}))")).as[Seq[Double]].head()
    val viaSortBounds = viaSort.drop(1).map(_._3) // each bucket's observed lo
    // same counts per bucket as the aggregate formulation would give:
    // recompute buckets from the percentile() boundaries driver-side
    val vals = df.select("v").as[Double].collect()
    val counts = (0 until 8).map { b =>
      vals.count { v =>
        val below = viaAgg.count(v > _)
        below == b
      }.toLong
    }
    assert(viaSort.map(_._2) == counts,
      s"sort-path buckets ${viaSort.map(_._2)} != percentile() buckets $counts")
    assert(viaSortBounds.size == 7)
  }

  test("exactPercentileBufferWarning states the giant-group sizing rule") {
    // 10 strata over 100M rows: 10M rows/group — under the 50M default
    assert(Summaries.exactPercentileBufferWarning(10L, 100000000L).isEmpty)
    // one corpus-wide stratum over 10B rows: the buffer cliff
    val warn = Summaries.exactPercentileBufferWarning(1L, 10000000000L)
    assert(warn.exists(_.contains("exact = false")))
    assert(warn.exists(_.contains("approx_percentile")))
    // threshold is inclusive-below: exactly at the bound stays quiet
    assert(Summaries.exactPercentileBufferWarning(2L, 100000000L, 50000000L).isEmpty)
    intercept[IllegalArgumentException](
      Summaries.exactPercentileBufferWarning(0L, 1L))
  }

  test("isotonicCalibration: monotone output, PAV reference, passthrough and full-pool edges") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // driver PAV over (n, pos) per occupied bin, ascending
    def pav(cells: Seq[(Int, Long, Long)]): Map[Int, Double] = {
      case class Block(bins: List[Int], n: Long, pos: Long)
      var stack = List.empty[Block]
      cells.sortBy(_._1).foreach { case (b, n, p) =>
        var blk = Block(List(b), n, p)
        while (stack.nonEmpty &&
          stack.head.pos.toDouble / stack.head.n >= blk.pos.toDouble / blk.n) {
          val top = stack.head
          stack = stack.tail
          blk = Block(top.bins ++ blk.bins, top.n + blk.n, top.pos + blk.pos)
        }
        stack = blk :: stack
      }
      stack.flatMap(bl => bl.bins.map(_ -> bl.pos.toDouble / bl.n)).toMap
    }
    // pseudo-random scores/labels exercising violations
    val rows = (0 until 500).map { i =>
      val score = ((i * 37 + 11) % 100) / 100.0
      val label = (i * 53 + 7) % 10 < 4 || score > 0.8 && i % 3 == 0
      (score, label)
    }
    val got = Summaries.isotonicCalibration(rows.toDF("score", "label"),
      "score", "label", bins = 10)
      .orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    val fitted = got.map(_._3)
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b },
      s"fitted not monotone: ${fitted.toSeq}")
    val cells = rows.groupBy(r => math.min((r._1 * 10).toInt, 9)).toSeq
      .map { case (b, rs) => (b, rs.size.toLong, rs.count(_._2).toLong) }
    val ref = pav(cells)
    got.foreach { case (b, _, f) => assert(f == r6(ref(b)), s"bin $b: $f vs ${ref(b)}") }
    // already-monotone rates pass through untouched
    val mono = Seq.fill(20)((0.05, false)) ++ Seq((0.05, true)) ++
      Seq.fill(10)((0.95, true)) ++ Seq((0.95, false))
    val m = Summaries.isotonicCalibration(mono.toDF("score", "label"),
      "score", "label", bins = 10).orderBy("bin")
      .collect().map(r => r.getDouble(2) -> r.getDouble(3))
    m.foreach { case (frac, fit) => assert(frac == fit) }
    // fully inverted rates pool into one global block
    val inv = Seq.fill(10)((0.05, true)) ++ Seq.fill(10)((0.95, false))
    val i2 = Summaries.isotonicCalibration(inv.toDF("score", "label"),
      "score", "label", bins = 10)
      .collect().map(_.getDouble(3)).distinct
    assert(i2.toSeq == Seq(0.5))
  }

  test("quantileNormalize maps equal within-group ranks to the SAME global value") {
    // two sources with disjoint scales: after normalization, the r-th
    // smallest of A and the r-th smallest of B land on the same global
    // inverse-CDF midpoint — scale harmonized, order preserved
    val rows = (1 to 10).map(v => ("a", v * 1.0, v)) ++
      (1 to 10).map(v => ("b", 100.0 + v, v))
    val out = Summaries.quantileNormalize(
      rows.toDF("g", "v", "rank"), "g", "v", nBuckets = 5)
      .select("g", "rank", "normalized")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (1 to 10).foreach { r =>
      assert(out(("a", r)) == out(("b", r)),
        s"rank $r: a=${out(("a", r))} b=${out(("b", r))}")
    }
    // monotone within each group
    (2 to 10).foreach { r =>
      assert(out(("a", r)) >= out(("a", r - 1)))
    }
    // NULL values stay NULL
    val withNull = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None))
      .toDF("g", "v")
    val nrow = Summaries.quantileNormalize(withNull, "g", "v", nBuckets = 2)
      .filter(col("v").isNull).head()
    assert(nrow.isNullAt(nrow.fieldIndex("normalized")))
  }

  test("aucByGroup: separable/inverted/tied/degenerate hand fixtures") {
    val df = Seq(
      // g1: positives strictly above negatives -> AUC 1
      ("g1", 3.0, true), ("g1", 4.0, true), ("g1", 1.0, false), ("g1", 2.0, false),
      // g2: pos {1,3} vs neg {2,4} -> 1 of 4 winning pairs -> 0.25
      ("g2", 1.0, true), ("g2", 3.0, true), ("g2", 2.0, false), ("g2", 4.0, false),
      // g3: one tied score both classes -> 0.5 (midrank half credit)
      ("g3", 2.0, true), ("g3", 2.0, false),
      // g4: no negatives -> NULL
      ("g4", 1.0, true), ("g4", 2.0, true))
      .toDF("g", "score", "label")
    val got = Summaries.aucByGroup(df, "g", "score", "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got("g1") == ((2L, 2L, Some(1.0))))
    assert(got("g2") == ((2L, 2L, Some(0.25))))
    assert(got("g3") == ((1L, 1L, Some(0.5))))
    assert(got("g4") == ((2L, 0L, None)))
  }

  test("aucByGroup equals the pairwise-count reference on pseudo-random corpora") {
    val rows = (0 until 400).map { i =>
      val g = s"g${i % 3}"
      val score = ((i * 31 + 7) % 23).toDouble / 4.0
      val label = (i * 17 + 3) % 5 < 2
      (g, score, label)
    }
    val got = Summaries.aucByGroup(rows.toDF("g", "score", "label"),
      "g", "score", "label")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val ref = wins / (pos.size.toDouble * neg.size.toDouble)
      assert(math.abs(got(g) - ref) < 1e-12, s"$g: ${got(g)} vs $ref")
    }
  }

  test("scoreEvalReport: perfect predictions score 0; a planted miss moves brier and the gaps") {
    val perfect = Seq((0.05, false), (0.04, false), (0.95, true), (0.96, true))
      .toDF("score", "label")
    val p = Summaries.scoreEvalReport(perfect, "score", "label", bins = 10).head()
    // brier = mean((s-y)^2) = (0.0025+0.0016+0.0025+0.0016)/4 = 0.00205
    assert(p.getAs[Double]("brier") == 0.00205)
    // bin0 gap = |0 - 0.045| = 0.045; bin9 gap = |1 - 0.955| = 0.045
    assert(p.getAs[Double]("max_abs_gap") == 0.045)
    assert(p.getAs[Double]("ece") == 0.045)
    assert(p.getAs[Long]("n") == 4L && p.getAs[Long]("n_bins") == 2L)
    // one confident wrong prediction dominates brier and widens its bin gap
    val missed = Seq((0.05, false), (0.95, true), (0.9, false))
      .toDF("score", "label")
    val m = Summaries.scoreEvalReport(missed, "score", "label", bins = 10).head()
    // (0.0025 + 0.0025 + 0.81) / 3 = 0.271667 (6 dp)
    assert(m.getAs[Double]("brier") == 0.271667)
    // bin9 holds {0.95 true, 0.9 false}: gap = |0.5 - 0.925| = 0.425
    assert(m.getAs[Double]("max_abs_gap") == 0.425)
  }

  test("exactArmWarning wires the sizing rule into the buffering exact arms") {
    // range() states an exact plan-time rowCount: 60M rows over the 50M
    // default trips the rule on the exact arm, stays silent on approx
    val big = spark.range(60000000L).toDF("v")
    val warn = Summaries.exactArmWarning(big, exact = true, "trimmedStats")
    assert(warn.exists(_.contains("trimmedStats")))
    assert(warn.exists(_.contains("exact = false")))
    assert(warn.exists(_.contains("single-stratum")))
    assert(Summaries.exactArmWarning(big, exact = false, "trimmedStats").isEmpty)
    // a small input stays quiet on both arms
    val small = spark.range(1000L).toDF("v")
    assert(Summaries.exactArmWarning(small, exact = true, "madOutliers").isEmpty)
  }

  test("rollupReport: prefix subtotals labeled (all); cube adds the column margins") {
    val df = Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 5L))
      .toDF("s", "l", "w")
    val roll = Summaries.rollupReport(df, Seq("s", "l"), "w")
      .orderBy("s", "l")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(roll == Seq(
      ("(all)", "(all)", 3L, 35L),
      ("a", "(all)", 2L, 30L),
      ("a", "x", 1L, 10L),
      ("a", "y", 1L, 20L),
      ("b", "(all)", 1L, 5L),
      ("b", "x", 1L, 5L)))
    val cube = Summaries.rollupReport(df, Seq("s", "l"), "w", cube = true)
      .orderBy("s", "l")
      .as[(String, String, Long, Long)].collect().toSeq
    // cube = rollup + the per-l margins
    assert(cube.size == roll.size + 2)
    assert(cube.contains(("(all)", "x", 2L, 15L)))
    assert(cube.contains(("(all)", "y", 1L, 20L)))
    intercept[IllegalArgumentException](Summaries.rollupReport(df, Seq.empty, "w"))
  }

  test("pivotCounts: explicit domain, absent combinations are 0, unlisted values drop") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"), ("b", "zz"))
      .toDF("s", "l")
    val got = Summaries.pivotCounts(df, "s", "l", Seq("x", "y"))
      .orderBy("s").as[(String, Long, Long)].collect().toSeq
    // 'zz' is outside the declared domain → not a column, not counted
    assert(got == Seq(("a", 2L, 1L), ("b", 0L, 1L)))
    intercept[IllegalArgumentException](Summaries.pivotCounts(df, "s", "l", Seq.empty))
  }

  test("cohenKappa: hand-computed confusion matrix and the pe=1 degeneracy") {
    // 10 rows: matrix a\b: (x,x)=4 (x,y)=1 (y,x)=2 (y,y)=3
    // po = 7/10; m1 = {x:5, y:5}, m2 = {x:6, y:4};
    // pe = (5·6 + 5·4)/100 = 0.5; κ = (0.7−0.5)/0.5 = 0.4
    val rows = Seq.fill(4)(("x", "x")) ++ Seq(("x", "y")) ++
      Seq.fill(2)(("y", "x")) ++ Seq.fill(3)(("y", "y"))
    val got = Summaries.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect().toSeq
    assert(got == Seq((10L, 7L, 0.7, 0.5, Some(0.4))))
    // both raters constant and agreeing: po = pe = 1 → κ NULL
    val const = Seq.fill(5)(("x", "x")).toDF("a", "b")
    val deg = Summaries.cohenKappa(const, "a", "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect().toSeq
    assert(deg == Seq((5L, 5L, 1.0, 1.0, None)))
  }

  test("giniByGroup matches closed forms: uniform 0, {1,9} 0.4, {0,0,10} 2/3") {
    val df = Seq(
      ("u", 1L, 5L), ("u", 2L, 5L), ("u", 3L, 5L),   // uniform → 0
      ("p", 4L, 1L), ("p", 5L, 9L),                  // (2·19−3·10)/20 = 0.4
      ("w", 6L, 0L), ("w", 7L, 0L), ("w", 8L, 10L),  // (2·30−4·10)/30 = 2/3
      ("z", 9L, 0L), ("z", 10L, 0L)                  // all-zero → NULL
    ).toDF("g", "id", "x")
    val got = Summaries.giniByGroup(df, "g", "x")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("u") == (("u", 3L, 15L, Some(0.0))))
    assert(got("p") == (("p", 2L, 10L, Some(0.4))))
    assert(got("w") == (("w", 3L, 10L, Some(2.0 / 3.0))))
    assert(got("z") == (("z", 2L, 0L, None)))
  }

  test("rankBiserial matches closed forms with cross-group ties: +1 / -1 / 0") {
    // a = {5,6} strictly above rest → +1; b = {1,2} strictly below → −1;
    // c = {3,3} tied block exactly centered → 0 (midranks must be used:
    // a min-rank or max-rank convention would break the symmetry)
    val df = Seq(
      ("a", 5L), ("a", 6L), ("b", 1L), ("b", 2L), ("c", 3L), ("c", 3L)
    ).toDF("g", "v")
    val got = Summaries.rankBiserial(df, "v", "g")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 4L, 1.0)))
    assert(got("b") == (("b", 2L, 4L, -1.0)))
    assert(got("c") == (("c", 2L, 4L, 0.0)))
  }

  test("ksDrift equals the driver-side two-sample KS over merged step points") {
    // hand fixture: a vs rest on values with ties ACROSS the two sides
    // (v=2 appears in both) — the RANGE frame must evaluate both CDFs
    // after the full step
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 5L),
      ("b", 2L), ("b", 3L), ("b", 3L), ("c", 9L)
    ).toDF("grp", "v")
    val got = Summaries.ksDrift(df, "v", "grp")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // driver-side reference: scan the merged sorted values; CDFs step
    // after all ties at each value, sup of |integer cross-products|
    def ks(target: String): (Long, Long, Double) = {
      val rows = df.as[(String, Long)].collect()
      val nt = rows.count(_._1 == target).toLong
      val nr = rows.length - nt
      val md = rows.map(_._2).distinct.sorted.map { v =>
        val ct = rows.count(r => r._1 == target && r._2 <= v).toLong
        val ca = rows.count(_._2 <= v).toLong
        math.abs(ct * nr - (ca - ct) * nt)
      }.max
      (nt, nr, md.toDouble / (nt * nr))
    }
    Seq("a", "b", "c").foreach { g =>
      val (nt, nr, expKs) = ks(g)
      val (_, gotNt, gotNr, gotKs) = got(g)
      assert((gotNt, gotNr) == (nt, nr), s"counts for $g")
      assert(gotKs == expKs, s"ks for $g: got $gotKs expected $expKs")
    }
    // the singleton outlier group 'c' must show the strongest drift
    assert(got("c")._4 > got("a")._4 && got("c")._4 > got("b")._4)
  }

  test("kaplanMeier: hand-checked curve, censor edge, at-risk suffix sums") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // lifetimes (first..last): u1 01-01..01-05, u2 01-01..01-10 (at the
    // edge → censored under censorDays=2), u3 01-02..01-06,
    // u4 01-03..01-07, u5 01-01..01-01; edge = 01-10
    val ev = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-05 09:00:00"),
      (2L, "2024-01-01 10:00:00"), (2L, "2024-01-10 11:00:00"),
      (3L, "2024-01-02 12:00:00"), (3L, "2024-01-06 13:00:00"),
      (4L, "2024-01-03 14:00:00"), (4L, "2024-01-07 15:00:00"),
      (5L, "2024-01-01 16:00:00")
    ).toDF("user_id", "s").select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val got = Summaries.kaplanMeier(ev, "user_id", "ts", censorDays = 2)
      .orderBy("duration_days")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    // dur 0: risk 5, 1 event → S = 0.8
    // dur 4: risk 4, 3 events → S = 0.8·0.25 = 0.2
    // dur 9: risk 1, 0 events, 1 censored → S stays 0.2
    assert(got == Seq((0, 5L, 1L, 0L, 0.8), (4, 4L, 3L, 0L, 0.2),
      (9, 1L, 0L, 1L, 0.2)))
    intercept[IllegalArgumentException](
      Summaries.kaplanMeier(ev, "user_id", "ts", censorDays = -1))
  }

  test("calibrationReport: hand-checked bins, top-bin clamp, signed gap") {
    val df = Seq(
      (0.05, false), (0.05, false), (0.12, true),
      (0.95, true), (1.0, true)  // 1.0 clamps into bin 9
    ).toDF("score", "label")
    val got = Summaries.calibrationReport(df, "score", "label", bins = 10)
      .orderBy("bin")
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 0.05, 0.0, -0.05),
      (1, 1L, 0.12, 1.0, 0.88),
      (9, 2L, 0.975, 1.0, 0.025)))
    intercept[IllegalArgumentException](
      Summaries.calibrationReport(df, "score", "label", bins = 1))
  }

  test("cusumChangepoint finds the level shift; direction signs the drift") {
    import org.apache.spark.sql.functions.{col, concat, lit, lpad, to_timestamp}
    // key "up": 5 days at 1/day then 5 days at 5/day → S dips most
    // negative at the shift boundary (counts ran BELOW the mean first)
    val ev = (1 to 5).flatMap(d => Seq(("up", d))) ++
      (6 to 10).flatMap(d => Seq.fill(5)(("up", d)))
    val df = ev.toDF("k", "day")
      .select(col("k"), to_timestamp(
        concat(lit("2024-01-"), lpad(col("day").cast("string"), 2, "0"),
          lit(" 12:00:00"))).as("ts"))
    val got = Summaries.cusumChangepoint(df, "k", "ts")
      .as[(String, java.sql.Date, Double, Int)].head()
    // mean = 3/day; S_d = cum − 3d: minimized at d=5 (S=−10)
    assert(got._1 == "up")
    assert(got._2.toString == "2024-01-05")
    assert(got._3 == 10.0)
    assert(got._4 == -1)
  }

  test("seasonalProfile: dow means over the zero-filled spine, worst residual") {
    import org.apache.spark.sql.functions.{col, concat, lit, to_timestamp}
    // two weeks of Mondays and Tuesdays; one Tuesday triples.
    // 2024-01-01 is a Monday (dow 1); 01-02/01-09 are Tuesdays (dow 2)
    val rows = Seq(
      ("a", "2024-01-01", 2), ("a", "2024-01-08", 2),
      ("a", "2024-01-02", 2), ("a", "2024-01-09", 6)
    ).flatMap { case (k, d, n) => Seq.fill(n)((k, d)) }
    val df = rows.toDF("k", "d")
      .select(col("k"), to_timestamp(concat(col("d"), lit(" 08:00:00"))).as("ts"))
    val got = Summaries.seasonalProfile(df, "k", "ts")
      .as[(String, Int, Long, Double, java.sql.Date, Double)]
      .collect().map(r => r._2 -> r).toMap
    // spine = OBSERVED dates (two Mondays, two Tuesdays) — no other dows
    assert(got.keySet == Set(1, 2))
    assert(got(1) == (("a", 1, 2L, 2.0, java.sql.Date.valueOf("2024-01-01"), 0.0)))
    // Tuesday mean (2+6)/2 = 4; residuals −2 and +2 tie on |…| →
    // earliest date wins: 01-02 at −2.0
    assert(got(2) == (("a", 2, 2L, 4.0, java.sql.Date.valueOf("2024-01-02"), -2.0)))
  }

  test("rollingActive: exact trailing-window distinct counts, span clamp") {
    import org.apache.spark.sql.functions.{col, concat, lit, to_timestamp}
    // u1 active d1 and d3 (twice on d3 — dedups); u2 active d1; u3 d4
    val rows = Seq((1L, 1), (1L, 3), (1L, 3), (2L, 1), (3L, 4))
    val df = rows.toDF("u", "day")
      .select(col("u"), to_timestamp(concat(lit("2024-01-0"),
        col("day").cast("string"), lit(" 10:00:00"))).as("ts"))
    val got = Summaries.rollingActive(df, "u", "ts", windowDays = 2)
      .orderBy("report_date")
      .as[(java.sql.Date, Long)].collect().toSeq
      .map { case (d, n) => (d.toString, n) }
    // windows of 2 days ending at each date, clamped to max d4:
    // d1: {u1,u2}=2; d2: {u1,u2}=2; d3: {u1}=1; d4: {u1,u3}=2
    assert(got == Seq(("2024-01-01", 2L), ("2024-01-02", 2L),
      ("2024-01-03", 1L), ("2024-01-04", 2L)))
    intercept[IllegalArgumentException](
      Summaries.rollingActive(df, "u", "ts", windowDays = 0))
  }

  test("binnedMutualInformation: independence gives MI 0, NMI 0") {
    // balanced product distribution: 25 rows per (x,y) ∈ {0,1}² — every
    // joint cell equals the product of its margins, so each term is
    // ln(1) = 0 EXACTLY
    val rows = for (x <- 0 to 1; y <- 0 to 1; _ <- 1 to 25) yield (x, y)
    val df = rows.toDF("x", "y")
    val r = Summaries.binnedMutualInformation(df, "x", "y",
      xBins = 2, yBins = 2, xLo = 0, xHi = 2, yLo = 0, yHi = 2).head()
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.0)                     // mi_nats
    assert(r.getDouble(4) == 0.693147 && r.getDouble(5) == 0.693147) // ln 2
    assert(r.getDouble(6) == 0.0)                     // nmi
  }

  test("binnedMutualInformation: perfect dependence gives MI = H and NMI 1") {
    val rows = (0 until 100).map(i => (i % 2, i % 2))
    val df = rows.toDF("x", "y")
    val r = Summaries.binnedMutualInformation(df, "x", "y",
      xBins = 2, yBins = 2, xLo = 0, xHi = 2, yLo = 0, yHi = 2).head()
    assert(r.getDouble(3) == 0.693147)                // mi = ln 2
    assert(r.getDouble(3) == r.getDouble(4) && r.getDouble(4) == r.getDouble(5))
    assert(r.getDouble(6) == 1.0)                     // nmi
  }

  test("binnedMutualInformation: out-of-range values clamp into edge bins; gates fire") {
    val df = Seq((-50, 0), (999, 1), (1, 0)).toDF("x", "y")
    val r = Summaries.binnedMutualInformation(df, "x", "y",
      xBins = 4, yBins = 2, xLo = 0, xHi = 4, yLo = 0, yHi = 2).head()
    // -50 → bin 0 (with the in-range 1 → bin 1), 999 → bin 3
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    intercept[IllegalArgumentException](
      Summaries.binnedMutualInformation(df, "x", "y", 1, 2, 0, 4, 0, 2))
    intercept[IllegalArgumentException](
      Summaries.binnedMutualInformation(df, "x", "y", 2, 2, 4, 4, 0, 2))
  }

  test("binnedMutualInformation matches a driver-side reference on a skewed fixture") {
    val rows = (0 until 200).map(i => (i % 7, (i * i) % 5))
    val df = rows.toDF("x", "y")
    val r = Summaries.binnedMutualInformation(df, "x", "y",
      xBins = 7, yBins = 5, xLo = 0, xHi = 7, yLo = 0, yHi = 5).head()
    // reference with the same 9-dp quantization
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rx = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ry = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toDouble
    def q9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val mi = cells.map { case ((x, y), o) =>
      q9((o / n) * math.log(o * n / (rx(x).toDouble * ry(y).toDouble)))
    }.sum.toDouble
    val hx = rx.values.map(c => q9(-(c / n) * math.log(c / n))).sum.toDouble
    val hy = ry.values.map(c => q9(-(c / n) * math.log(c / n))).sum.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == r6(mi))
    assert(r.getDouble(4) == r6(hx) && r.getDouble(5) == r6(hy))
    assert(r.getDouble(6) == r6(mi / math.sqrt(hx * hy)))
  }
}
