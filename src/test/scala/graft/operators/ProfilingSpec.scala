package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("en"), "web"),
    (2L, Some("en"), "web"),
    (3L, None, "book"),
    (4L, Some("de"), "book"),
    (5L, None, "web")
  ).toDF("id", "lang", "source")

  test("profileColumns: one row per column with exact counts, null fractions, string min/max") {
    val got = Profiling.profileColumns(df, Seq("id", "lang", "source"))
      .orderBy("column")
      .as[(String, Long, Long, Double, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      ("id", 5L, 0L, 0.0, 5L, Some("1"), Some("5")),
      ("lang", 5L, 2L, 0.4, 2L, Some("de"), Some("en")),
      ("source", 5L, 0L, 0.0, 2L, Some("book"), Some("web"))))
  }

  test("profileColumns: an all-null column yields NULL min/max and full null_frac") {
    val nulls = df.withColumn("gone", org.apache.spark.sql.functions.lit(null: String))
    val got = Profiling.profileColumns(nulls, Seq("gone"))
      .as[(String, Long, Long, Double, Long, Option[String], Option[String])]
      .head()
    assert(got == (("gone", 5L, 5L, 1.0, 0L, None, None)))
  }

  test("profileColumns approx arm: HLL distinct within rsd, same schema and row set") {
    val wide = spark.range(100000).select(col("id"),
      (col("id") % 997).as("m"), col("id").cast("string").as("s"))
    val exact = Profiling.profileColumns(wide, Seq("id", "m", "s"))
      .orderBy("column")
      .as[(String, Long, Long, Double, Long, Option[String], Option[String])]
      .collect().toSeq
    val approx = Profiling.profileColumns(wide, Seq("id", "m", "s"), exact = false)
      .orderBy("column")
      .as[(String, Long, Long, Double, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(exact.map(_._5) == Seq(100000L, 997L, 100000L))
    exact.zip(approx).foreach { case (e, a) =>
      // everything but the sketched cardinality is identical
      assert((a._1, a._2, a._3, a._4, a._6, a._7) ==
        ((e._1, e._2, e._3, e._4, e._6, e._7)))
      assert(math.abs(a._5 - e._5).toDouble / e._5 < 0.10,
        s"${e._1}: approx ${a._5} vs exact ${e._5}")
    }
  }

  test("profileColumns rejects unknown and quoted columns, empty selections") {
    intercept[IllegalArgumentException](Profiling.profileColumns(df, Seq.empty))
    intercept[IllegalArgumentException](Profiling.profileColumns(df, Seq("nope")))
    intercept[IllegalArgumentException](Profiling.profileColumns(df, Seq("a'b")))
  }

  test("fanoutAudit counts childless parents and orphan children") {
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val child = Seq(1L, 1L, 4L, 4L, 4L).toDF("fk")
    val got = Profiling.fanoutAudit(parent, child, "pid", "fk")
      .as[(Long, Long)].collect().toSet
    // parent 1 has 2 children, parents 2/3 none; 3 orphan child rows (fk=4)
    assert(got == Set((2L, 1L), (0L, 2L), (-1L, 3L)))
    // clean corpus: orphan sentinel still present at 0
    val clean = Profiling.fanoutAudit(parent, Seq(1L, 2L).toDF("fk"), "pid", "fk")
      .as[(Long, Long)].collect().toSet
    assert(clean == Set((1L, 2L), (0L, 1L), (-1L, 0L)))
    // NULL keys: a NULL child key is an orphan, a NULL parent key is
    // childless — and neither poisons the other side (the NOT IN trap)
    val pNull = Seq(Some(1L), None).toDF("pid")
    val cNull = Seq(Some(1L), None, None).toDF("fk")
    val gotNull = Profiling.fanoutAudit(pNull, cNull, "pid", "fk")
      .as[(Long, Long)].collect().toSet
    assert(gotNull == Set((1L, 1L), (0L, 1L), (-1L, 2L)))
  }

  test("fanoutAudit invariants hold on random parent/child sets") {
    // deterministic pseudo-random cases: keys drawn from a small range so
    // fanout, childless, and orphan all occur
    (0 until 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val parents = (0 until rnd.nextInt(6) + 1).map(_ => rnd.nextInt(8).toLong).distinct
      val children = (0 until rnd.nextInt(15)).map(_ => rnd.nextInt(10).toLong)
      val got = Profiling.fanoutAudit(parents.toDF("pid"), children.toDF("fk"),
        "pid", "fk")
        .as[(Long, Long)].collect().toMap
      val fanRef = parents.map(p => children.count(_ == p))
        .groupBy(identity).map { case (k, v) => k.toLong -> v.size.toLong }
      val orphRef = children.count(c => !parents.contains(c)).toLong
      assert(got.filter(_._1 >= 0) == fanRef, s"seed $seed fanout")
      assert(got(-1L) == orphRef, s"seed $seed orphans")
      // conservation: parents partition across k ≥ 0; children split
      // between matched fanout mass and orphans
      assert(got.filter(_._1 >= 0).values.sum == parents.size.toLong)
      assert(got.filter(_._1 >= 0).map { case (k, n) => k * n }.sum + got(-1L)
        == children.size.toLong)
    }
  }

  test("benfordProfile extracts first digits of the integer part, excluding x < 1") {
    val vals = Seq(1.5, 23.0, 0.7, 999.99, 12.0).toDF("x")
    val got = Profiling.benfordProfile(vals, "x")
      .select("digit", "n", "share").as[(Int, Long, Double)].collect().toSet
    // 0.7 excluded; digits: 1 (1.5), 2 (23), 9 (999.99), 1 (12)
    assert(got == Set((1, 2L, 0.5), (2, 1L, 0.25), (9, 1L, 0.25)))
    val exp = Profiling.benfordProfile(vals, "x")
      .select("digit", "expected").as[(Int, Double)].collect().toMap
    assert(exp(1) == 0.30103 && exp(2) == 0.176091 && exp(9) == 0.045757)
  }

  test("embeddingAudit counts defects and keeps norm stats clean-rows-only") {
    val rows = Seq(
      ("a", Seq[Option[Float]](Some(3.0f), Some(4.0f))),          // norm 5
      ("a", Seq[Option[Float]](Some(0.0f), Some(0.0f))),          // zero vector
      ("a", null),                                                // null
      ("a", Seq[Option[Float]](Some(Float.NaN), Some(1.0f))),     // NaN → bad
      ("a", Seq[Option[Float]](Some(1.0f), None)),                // null elem → bad
      ("a", Seq[Option[Float]](Some(1.0f), Some(0.0f), Some(0.0f))), // dim 3, norm 1
      ("b", Seq[Option[Float]](Some(6.0f), Some(8.0f)))           // norm 10
    ).toDF("label", "embedding")
    val got = Profiling.embeddingAudit(rows, "label", "embedding")
      .orderBy("label")
      .as[(String, Long, Long, Long, Long, Int, Int, Double, Double, Double)]
      .collect()
    val a = got(0)
    // n=6, one null, two bad (NaN + null element), one zero; dims 2..3;
    // clean norms {5, 0, 1} → mean 2.0
    assert(a == (("a", 6L, 1L, 2L, 1L, 2, 3, 0.0, 5.0, 2.0)))
    assert(got(1) == (("b", 1L, 0L, 0L, 0L, 2, 2, 10.0, 10.0, 10.0)))
    // all-dirty label: counters live, norm stats NULL
    val dirty = Seq(("c", Option.empty[Array[Float]])).toDF("label", "embedding")
    val c = Profiling.embeddingAudit(dirty, "label", "embedding")
      .select("n", "n_null", "min_norm", "mean_norm")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(c == ((1L, 1L, None, None)))
  }

  test("functionalDeps: keys determine everything, violations counted, NULL is a value") {
    val df = Seq(
      (1L, "x", "p"), (2L, "x", "p"), (3L, "y", "q"), (4L, "y", "r")
    ).toDF("id", "b", "c")
    val got = Profiling.functionalDeps(df, Seq("id", "b", "c"))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("id", "b")) == ((4L, 0L, true)))   // id is a key
    assert(got(("id", "c")) == ((4L, 0L, true)))
    assert(got(("b", "c")) == ((2L, 1L, false)))   // y → {q, r}
    assert(got(("c", "b")) == ((3L, 0L, true)))    // p→x, q→y, r→y
    assert(got(("b", "id")) == ((2L, 2L, false)))
    // NULL determinant groups as a value: (null → p) and (null → q)
    // is one group with two dependents = one violation
    val withNull = Seq((Option.empty[String], "p"), (None, "q"), (Some("a"), "p"))
      .toDF("k", "v")
    val n = Profiling.functionalDeps(withNull, Seq("k", "v"))
      .filter($"determinant" === "k")
      .as[(String, String, Long, Long, Boolean)].head()
    assert(n == (("k", "v", 2L, 1L, false)))
    intercept[IllegalArgumentException](Profiling.functionalDeps(df, Seq("id")))
  }

  test("countMin: est >= exact always, exact when width clears the vocab") {
    val items = (Seq.fill(50)("heavy") ++ Seq.fill(7)("mid") ++
      ('a' to 'z').map(_.toString)).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = items.toDF("i", "item")
    val exact = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val probes = exact.keys.toSeq.toDF("item")

    // collision regime: width 4 << vocab 28 — every estimate still
    // upper-bounds the true count (the CMS one-sided guarantee)
    val tight = Profiling.countMinEstimate(
      Profiling.countMinSketch(df, "item", depth = 3, width = 4),
      probes, "item", depth = 3, width = 4)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) =>
      assert(tight(k) >= c, s"$k: est ${tight(k)} < true $c")
    }
    // wide regime: width 4096 ≫ vocab — no collisions, every est exact
    val wide = Profiling.countMinEstimate(
      Profiling.countMinSketch(df, "item", depth = 3, width = 4096),
      probes, "item", depth = 3, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(wide == exact)
    // a probe absent from the corpus estimates only collision mass
    val ghost = Profiling.countMinEstimate(
      Profiling.countMinSketch(df, "item", depth = 3, width = 4096),
      Seq("zzz-never-seen").toDF("item"), "item", depth = 3, width = 4096)
      .as[(String, Long)].head()
    assert(ghost._2 == 0L)
    intercept[IllegalArgumentException](
      Profiling.countMinSketch(df, "item", depth = 0, width = 4))
  }

  test("hll: register-bounded sketch, estimate tracks exact, shards merge by max") {
    def items(n: Int, salt: String) =
      (0 until n).map(i => s"$salt-item-$i").toDF("item")
    for (n <- Seq(10, 200, 2000)) {
      val df = items(n, "a")
      val sk = Profiling.hllSketch(df, "item", m = 256)
      assert(sk.count() <= 256)
      val est = Profiling.hllEstimate(sk, m = 256)
        .select("est").as[Double].head()
      // HLL with m=256 has ~6.5% rsd; allow 4 sigma
      assert(math.abs(est - n) < math.max(4 * 0.065 * n, 8.0),
        s"n=$n est=$est")
    }
    // mergeability: max-combining two shard sketches == whole-corpus sketch
    val whole = items(500, "a")
    // split by a value predicate, not limit(): two limit() evaluations
    // carry no guarantee of picking the same rows
    val sA = Profiling.hllSketch(whole.filter($"item" < "a-item-3"), "item", m = 64)
    val sB = Profiling.hllSketch(whole.filter($"item" >= "a-item-3"), "item", m = 64)
    val merged = sA.unionByName(sB).groupBy("reg")
      .agg(org.apache.spark.sql.functions.max($"max_rho").as("max_rho"))
    val direct = Profiling.hllSketch(whole, "item", m = 64)
    assert(merged.orderBy("reg").collect().toSeq ==
      direct.orderBy("reg").collect().toSeq)
    intercept[IllegalArgumentException](Profiling.hllSketch(whole, "item", m = 100))
  }

  test("bloom: zero false negatives, shards merge by bit_or, absent probes mostly reject") {
    val present = (0 until 100).map(i => s"in-$i").toDF("item")
    val absent = (0 until 100).map(i => s"out-$i").toDF("item")
    val sk = Profiling.bloomSketch(present, "item", bits = 4096, hashes = 3)
    val gotP = Profiling.bloomMaybeContains(sk, present, "item", 4096, 3)
      .as[(String, Boolean)].collect()
    // the Bloom contract: NO false negative, ever
    assert(gotP.forall(_._2), "false negative detected")
    // 100 items × 3 hashes in 4096 bits → fp rate ~0.04%; all 100
    // absent probes must reject (deterministic fixture)
    val gotA = Profiling.bloomMaybeContains(sk, absent, "item", 4096, 3)
      .as[(String, Boolean)].collect()
    assert(gotA.count(_._2) <= 2, s"too many false positives: ${gotA.count(_._2)}")
    // mergeability: bit_or of two half-corpus sketches == whole sketch
    val sA = Profiling.bloomSketch(present.filter($"item" < "in-5"), "item", 4096, 3)
    val sB = Profiling.bloomSketch(present.filter($"item" >= "in-5"), "item", 4096, 3)
    val merged = sA.unionByName(sB).groupBy("word")
      .agg(org.apache.spark.sql.functions.expr("bit_or(bits)").as("bits"))
    assert(merged.orderBy("word").collect().toSeq ==
      sk.orderBy("word").collect().toSeq)
    intercept[IllegalArgumentException](
      Profiling.bloomSketch(present, "item", bits = 100, hashes = 3))
  }

  test("rankSampleSketch matches the driver bottom-k reference; merge = re-top-k") {
    val rows = (0L until 400L).map(i => (i, (i * 37) % 1000))
    val df = rows.toDF("id", "v")
    val got = Profiling.rankSampleSketch(df, "id", "v", k = 50)
      .orderBy("rn").as[(Long, Long, Long)].collect().toSeq
    // reference: same md5 ticket, bottom-50 by (ticket, value)
    val md = java.security.MessageDigest.getInstance("MD5")
    def ticket(id: Long): Long = {
      val hex = md.digest(s"rs$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % (1L << 50)
    }
    val exp = rows.map { case (id, v) => (ticket(id), v) }
      .sorted.take(50).zipWithIndex
      .map { case ((t, v), i) => ((i + 1).toLong, t, v) }
    assert(got == exp)
    // partitioning-independent
    assert(Profiling.rankSampleSketch(df.repartition(7), "id", "v", 50)
      .orderBy("rn").as[(Long, Long, Long)].collect().toSeq == exp)
    // MERGEABLE: bottom-k of the union == re-top-k over the two shards'
    // sketches (the sketch rows carry everything the merge needs)
    val a = Profiling.rankSampleSketch(df.filter($"id" < 200), "id", "v", 50)
    val b = Profiling.rankSampleSketch(df.filter($"id" >= 200), "id", "v", 50)
    val mergedRows = a.unionByName(b)
      .orderBy($"ticket", $"value").limit(50)
      .select($"ticket", $"value").as[(Long, Long)].collect().toSeq
    assert(mergedRows == exp.map(e => (e._2, e._3)))
    // quantile estimates off the sample track the exact corpus quantiles
    val est = Profiling.rankSampleQuantiles(
      Profiling.rankSampleSketch(df, "id", "v", 200), Seq(0.5))
      .as[(Double, Double)].head()
    val exact = df.agg(
      org.apache.spark.sql.functions.expr("percentile(v, 0.5)")).as[Double].head()
    assert(math.abs(est._2 - exact) < 150, s"median est ${est._2} vs $exact")
    intercept[IllegalArgumentException](
      Profiling.rankSampleSketch(df, "id", "v", k = 4))
    intercept[IllegalArgumentException](
      Profiling.rankSampleQuantiles(a, Seq(1.5)))
  }

  test("expectationReport: every rule type counts its planted violations, in one pass") {
    import Profiling._
    val rows = Seq(
      (1L, Some("en"), Some(10L), Some("src1")),
      (1L, Some("de"), Some(20L), Some("src2")),      // duplicate id
      (2L, None, Some(999L), Some("SRC3")),           // null lang, range+regex violations
      (3L, Some("xx"), None, None),                   // bad lang, null range col ok, null src ok
      (4L, Some("fr"), Some(-5L), Some("src9")))      // below range
      .toDF("id", "lang", "n", "src")
    val got = expectationReport(rows, Seq(
      ExpectNotNull("lang"),
      ExpectUnique("id"),
      ExpectInRange("n", 0, 100),
      ExpectInSet("lang", Seq("de", "en", "es", "fr", "zh")),
      ExpectMatches("src", "src[0-9]+")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("not_null(lang)") == ((5L, 1L)))
    assert(got("unique(id)") == ((5L, 1L)))          // id 1 twice: one extra copy
    assert(got("in_range(n,0.0,100.0)") == ((5L, 2L))) // 999 and -5; NULL exempt
    assert(got("in_set(lang)") == ((5L, 1L)))        // 'xx'; NULLs exempt
    assert(got("matches(src)") == ((5L, 1L)))        // 'SRC3'; NULL exempt; regex anchored
    // the anchored wrap rejects partial matches ('src1x' is not src[0-9]+)
    val partial = expectationReport(Seq(("src1x")).toDF("src"),
      Seq(ExpectMatches("src", "src[0-9]+"))).head()
    assert(partial.getLong(2) == 1L)
    intercept[IllegalArgumentException](expectationReport(rows, Seq.empty))
    intercept[IllegalArgumentException](
      expectationReport(rows, Seq(ExpectInRange("n", 5, 1))))
    intercept[IllegalArgumentException](
      expectationReport(rows, Seq(ExpectNotNull("lang"), ExpectNotNull("lang"))))
  }
}
