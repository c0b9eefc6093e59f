package graft.operators

import org.apache.spark.sql.functions.{col, lit, when}

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(docs, "doc_id", 300).select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 300)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
    // rough permille sanity: 300‰ ± wide slack on 500 docs
    assert(a.size > docs.count() * 0.15 && a.size < docs.count() * 0.45)
  }

  test("hashSampleN returns exactly min(n, target) rows, deterministically") {
    val a = Sampling.hashSampleN(docs, "doc_id", 64)
      .select("doc_id").as[Long].collect().toSet
    assert(a.size == 64)
    val b = Sampling.hashSampleN(docs.repartition(7), "doc_id", 64)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // target beyond n: the whole relation, once
    val all = Sampling.hashSampleN(docs, "doc_id", 100000)
    assert(all.count() == docs.count())
    // absolute-size contract: the 64 winners over a SUPERSET corpus are
    // still 64 — growth can only churn which ids win, never the size
    val grown = docs.union(docs.select(
      ((col("doc_id") + 1000000).as("doc_id") +:
        docs.columns.filter(_ != "doc_id").map(col).toIndexedSeq): _*))
    assert(Sampling.hashSampleN(grown, "doc_id", 64).count() == 64)
  }

  test("hashSampleN refuses a non-integral id column instead of returning an empty sample") {
    // a string id casts to null inside BOTH the ticket heap and the
    // winner semi-join — before the plan-time guard this silently
    // returned an EMPTY sample (and empty eval reports downstream)
    val stringIds = Seq(("doc-1", "a"), ("doc-2", "b")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException](
      Sampling.hashSampleN(stringIds, "doc_id", 1))
    assert(ex.getMessage.contains("integral id column"))
    // an explicit cast by the caller is the documented escape hatch
    val casted = Sampling.hashSampleN(
      docs.withColumn("doc_id", col("doc_id").cast("int")), "doc_id", 8)
    assert(casted.count() == 8)
  }

  test("hashSampleN winners are the target-smallest tickets, id ties") {
    val ids = docs.select("doc_id").as[Long].collect()
    def ticket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("us" + id.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % (1L << 50)
    }
    val expect = ids.map(id => (ticket(id), id)).sorted.take(16).map(_._2).toSet
    val got = Sampling.hashSampleN(docs, "doc_id", 16)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
  }

  test("different salts draw independent samples") {
    val a = Sampling.hashSample(docs, "doc_id", 300, salt = "a")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 300, salt = "b")
      .select("doc_id").as[Long].collect().toSet
    assert(a != b)
  }

  test("trainTestSplit is a disjoint exact cover; label column agrees") {
    val (train, test) = Sampling.trainTestSplit(docs, "doc_id", 200)
    val tr = train.select("doc_id").as[Long].collect().toSet
    val te = test.select("doc_id").as[Long].collect().toSet
    assert((tr & te).isEmpty)
    assert(tr.size + te.size == docs.count())
    val labeled = Sampling.withSplitLabel(docs, "doc_id", 200)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(te.forall(labeled(_) == "test") && tr.forall(labeled(_) == "train"))
  }

  test("stratifiedHashSample applies per-stratum rates with a default") {
    val all = docs.count()
    val none = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map.empty, 0).count()
    val everything = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map.empty, 1000).count()
    assert(none == 0 && everything == all)
    // zeroing one stratum removes exactly that stratum's rows vs default-only
    val langs = docs.select("lang").distinct().as[String].collect()
    val l0 = langs.head
    val base = Sampling.stratifiedHashSample(docs, "doc_id", "lang", Map.empty, 1000)
    val drop = Sampling.stratifiedHashSample(docs, "doc_id", "lang", Map(l0 -> 0), 1000)
    assert(base.count() - drop.count() == docs.filter($"lang" === l0).count())
  }

  test("permille bounds are enforced") {
    intercept[IllegalArgumentException](Sampling.hashSample(docs, "doc_id", 1001))
    intercept[IllegalArgumentException](Sampling.trainTestSplit(docs, "doc_id", -1))
  }

  test("assignShards: exact cover, dense 0-based positions, partitioning-independent") {
    val out = Sampling.assignShards(docs, "doc_id", nShards = 8, salt = "e1")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == docs.count())
    assert(out.map(_._1).distinct.length == out.length)       // every doc exactly once
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // positions within each shard are exactly 0..n-1
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // same corpus + salt → identical layout under any partitioning
    val re = Sampling.assignShards(docs.repartition(7), "doc_id", 8, salt = "e1")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(re.toSet == out.toSet)
    // a fresh salt re-deals the corpus
    val e2 = Sampling.assignShards(docs, "doc_id", 8, salt = "e2")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(e2.toSet != out.toSet)
    intercept[IllegalArgumentException](Sampling.assignShards(docs, "doc_id", 0))
  }

  test("assignShards warns when nShards is below the cluster parallelism (the sizing rule)") {
    // VERDICT r8 #2: each shard's (hash, id) sort is ONE task — nShards
    // below the parallelism leaves cores idle and makes shard sorts huge.
    // The rule is nShards ≈ corpus / target-shard-size, at/above cores.
    assert(Sampling.shardParallelismWarning(8, 32).isDefined)
    assert(Sampling.shardParallelismWarning(8, 32).get.contains("nShards=8"))
    assert(Sampling.shardParallelismWarning(32, 32).isEmpty)
    assert(Sampling.shardParallelismWarning(1024, 32).isEmpty)
    // the warn path still computes the correct layout
    val out = Sampling.assignShards(docs, "doc_id", nShards = 2, salt = "w")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == docs.count())
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
  }

  test("weightedSample matches the driver-side Efraimidis–Spirakis reference exactly") {
    import java.security.MessageDigest
    // the same priority arithmetic, computed independently on the driver
    def priority(id: Long, w: Long): Double = {
      val hex = MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 60)
      math.log(u) / w.toDouble
    }
    val rows = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
    val expect = rows.sortBy { case (id, w) => (-priority(id, w), id) }
      .take(25).map(_._1).toSet
    val got = Sampling.weightedSample(docs.select("doc_id", "n_chars"),
      "doc_id", "n_chars", k = 25)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect)
    // partitioning-independent (row fate is a pure function of the row)
    val re = Sampling.weightedSample(docs.repartition(7).select("doc_id", "n_chars"),
      "doc_id", "n_chars", k = 25)
      .select("doc_id").as[Long].collect().toSet
    assert(re == expect)
    intercept[IllegalArgumentException](
      Sampling.weightedSample(docs, "doc_id", "n_chars", k = 0))
  }

  test("weightedSamplePerGroup matches the per-group driver-side ES reference") {
    import java.security.MessageDigest
    def priority(id: Long, w: Long): Double = {
      val hex = MessageDigest.getInstance("MD5").digest(("s" + id).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 60)
      math.log(u) / w.toDouble
    }
    val rows = docs.select("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)].collect()
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (lang, rs) =>
      rs.sortBy { case (id, _, w) => (-priority(id, w), id) }
        .take(5).zipWithIndex.map { case ((id, _, _), i) => (lang, id, i + 1L) }
    }.toSet
    val got = Sampling.weightedSamplePerGroup(
      docs.select("doc_id", "lang", "n_chars"),
      "doc_id", "n_chars", "lang", k = 5, salt = "s")
      .as[(String, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("weightedSample favors heavy rows: inclusion rate rises with weight") {
    // 400 light rows (w=1) vs 100 heavy rows (w=50): a 100-row sample
    // must draw mostly heavy rows (each heavy row's inclusion odds are
    // ~50x a light row's; the split below holds with huge margin).
    val df = spark.range(500)
      .withColumn("w", org.apache.spark.sql.functions.when($"id" < 100, 50L).otherwise(1L))
    val got = Sampling.weightedSample(df.toDF(), "id", "w", k = 100)
      .select("id").as[Long].collect()
    val nHeavy = got.count(_ < 100)
    assert(nHeavy > 60, s"expected mostly heavy rows, got $nHeavy/100")
  }

  test("leakSafeSplit co-locates exact duplicates; uniques get the plain hash split") {
    val base = docs.select("doc_id", "text")
    val copies = base.filter($"doc_id" % 3 === 0)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val out = Sampling.leakSafeSplit(base.unionByName(copies), "doc_id", "text",
      testPermille = 300, salt = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every copy follows its original
    copies.select("doc_id").as[Long].collect().foreach { cid =>
      assert(out(cid) == out(cid - 5000L), s"copy $cid split differs from original")
    }
    // both labels actually occur
    assert(out.values.toSet == Set("train", "test"))
    intercept[IllegalArgumentException](
      Sampling.leakSafeSplit(base, "doc_id", "text", 1500))
  }

  test("temperatureResample flattens group shares toward uniform at the expected size") {
    val langs = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val kept = Sampling.temperatureResample(
      docs.select("doc_id", "lang"), "doc_id", "lang", alpha = 0.5, frac = 0.5)
      .select("doc_id", "lang").as[(Long, String)].collect()
    // expected total size frac*N (generous band for 500 docs)
    assert(kept.length > docs.count() * 0.35 && kept.length < docs.count() * 0.65,
      s"kept ${kept.length} of ${docs.count()}")
    // flattening: the dominant group's share must SHRINK, a minority
    // group's share must GROW (α=0.5 pulls toward uniform)
    val keptBy = kept.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val n = docs.count().toDouble
    val dominant = langs.maxBy(_._2)._1
    val minority = langs.minBy(_._2)._1
    assert(keptBy(dominant) / kept.length < langs(dominant) / n,
      "dominant group share must shrink")
    assert(keptBy(minority) / kept.length > langs(minority) / n,
      "minority group share must grow")
    // determinism + partitioning-independence
    val re = Sampling.temperatureResample(
      docs.repartition(7).select("doc_id", "lang"), "doc_id", "lang", 0.5, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(re == kept.map(_._1).toSet)
    // α = 1 degenerates to plain hash sampling at rate frac
    val alpha1 = Sampling.temperatureResample(
      docs.select("doc_id", "lang"), "doc_id", "lang", alpha = 1.0, frac = 0.3,
      salt = "z")
      .select("doc_id").as[Long].collect().toSet
    val plain = docs.select("doc_id", "lang").as[(Long, String)].collect()
      .map(_._1).filter { id =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(("z" + id).getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 60)
        u < 0.3
      }.toSet
    assert(alpha1 == plain)
    intercept[IllegalArgumentException](
      Sampling.temperatureResample(docs, "doc_id", "lang", 0.0, 0.5))
    intercept[IllegalArgumentException](
      Sampling.temperatureResample(docs, "doc_id", "lang", 0.5, 1.5))
  }

  test("targetShareResample matches the driver-side rate+hash reference; unlisted drop") {
    // 100 docs over 4 sources: a=40, b=30, c=20, d=10; shares a=.2 b=.2
    // c=.4 (d unlisted → dropped); budgetFrac=.5, N=100 →
    // rates: a: .5·.2·100/40=.25, b: .5·.2·100/30=.333…, c: .5·.4·100/20=1
    val docs100 = spark.range(100)
      .select(col("id").as("doc_id"),
        when(col("id") < 40, "a").when(col("id") < 70, "b")
          .when(col("id") < 90, "c").otherwise("d").as("src"))
    val shares = Map("a" -> 0.2, "b" -> 0.2, "c" -> 0.4)
    val kept = Sampling.targetShareResample(docs100, "doc_id", "src", shares,
      budgetFrac = 0.5)
      .select("doc_id", "src").as[(Long, String)].collect().toSet
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 60)
    }
    def q12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rate = Map("a" -> q12(math.min(1.0, 0.5 * 0.2 * 100.0 / 40.0)),
      "b" -> q12(math.min(1.0, 0.5 * 0.2 * 100.0 / 30.0)),
      "c" -> q12(math.min(1.0, 0.5 * 0.4 * 100.0 / 20.0)))
    val expect = (0L until 100L).flatMap { id =>
      val s = if (id < 40) "a" else if (id < 70) "b" else if (id < 90) "c" else "d"
      rate.get(s).filter(u(id) < _).map(_ => (id, s))
    }.toSet
    assert(kept == expect)
    // group c is too small for its target: rate clipped to 1 → ALL kept
    assert(kept.count(_._2 == "c") == 20)
    // unlisted source d contributes nothing
    assert(!kept.exists(_._2 == "d"))
    // partitioning-independence
    val re = Sampling.targetShareResample(docs100.repartition(7), "doc_id", "src",
      shares, budgetFrac = 0.5).select("doc_id").as[Long].collect().toSet
    assert(re == kept.map(_._1))
    intercept[IllegalArgumentException](
      Sampling.targetShareResample(docs100, "doc_id", "src", Map.empty[String, Double]))
    intercept[IllegalArgumentException](
      Sampling.targetShareResample(docs100, "doc_id", "src", Map("a" -> 0.9, "b" -> 0.2)))
    intercept[IllegalArgumentException](
      Sampling.targetShareResample(docs100, "doc_id", "src", shares, budgetFrac = 0.0))
  }

  test("negativeSamples: exactly k draws per row, deterministic, frequency-proportional") {
    // skewed vocabulary: "the" dominates, so draws must too
    val docs = (0 until 200).map { i =>
      (i.toLong, "the the the the cat " + (if (i % 2 == 0) "sat" else "mat"))
    }.toDF("doc_id", "text")
    val got = Sampling.negativeSamples(docs, "doc_id", "text", k = 5)
      .as[(Long, Int, String)].collect().toSeq

    // exactly one token per (id, j) — the covering interval is unique
    assert(got.size == 200 * 5)
    assert(got.map(r => (r._1, r._2)).distinct.size == 200 * 5)
    // deterministic: a second run draws the identical multiset
    val again = Sampling.negativeSamples(docs, "doc_id", "text", k = 5)
      .as[(Long, Int, String)].collect().toSeq
    assert(got.sorted == again.sorted)
    // frequency-proportional: "the" is 4/6 of the corpus mass; with
    // 1000 draws the observed share is tightly around it (±0.1)
    val theShare = got.count(_._3 == "the").toDouble / got.size
    assert(math.abs(theShare - 4.0 / 6.0) < 0.1, s"the-share $theShare")
    // every drawn token exists in the vocabulary
    assert(got.map(_._3).toSet.subsetOf(Set("the", "cat", "sat", "mat")))
    intercept[IllegalArgumentException](
      Sampling.negativeSamples(docs, "doc_id", "text", k = 0))
  }

  test("uniformKPerGroup matches the brute-force hash-rank reference") {
    val rows = (0L until 300L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val k = 10
    val got = Sampling.uniformKPerGroup(rows, "id", "g", k)
      .as[(String, Long, Long)].collect().toSet
    // reference: rank by (md5-ticket mod 2^50, id) within each group
    val md = java.security.MessageDigest.getInstance("MD5")
    def ticket(id: Long): Long = {
      val hex = md.digest(s"us$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % (1L << 50)
    }
    val exp = (0L until 300L).groupBy(i => s"g${i % 4}").flatMap { case (g, ids) =>
      ids.sortBy(i => (ticket(i), i)).take(k).zipWithIndex
        .map { case (id, r) => (g, id, (r + 1).toLong) }
    }.toSet
    assert(got == exp)
    // small group: emits the whole group, never more
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "g")
    assert(Sampling.uniformKPerGroup(tiny, "id", "g", 10).count() == 2)
    intercept[IllegalArgumentException](
      Sampling.uniformKPerGroup(tiny, "id", "g", 0))
  }

  test("bootstrapMeanCI matches the driver-side Poisson-hash reference exactly") {
    val rows = (0L until 50L).map(i => (i, i)).toDF("id", "v")
    val got = Sampling.bootstrapMeanCI(rows, "id", "v", replicates = 20).head()
    // reference: same md5 micro-grid ticket, same CDF thresholds, same
    // interpolated percentile
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(b: Int, id: Long): Long = {
      val hex = md.digest(s"boot$b:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16) % 1000000L
      if (u < 367879) 0L else if (u < 735759) 1L else if (u < 919699) 2L
      else if (u < 981012) 3L else if (u < 996340) 4L else if (u < 999406) 5L
      else 6L
    }
    val means = (0 until 20).flatMap { b =>
      val ws = (0L until 50L).map(i => weight(b, i) * i).sum
      val wn = (0L until 50L).map(i => weight(b, i)).sum
      if (wn > 0) Some(ws.toDouble / wn.toDouble) else None
    }.sorted
    def pct(q: Double): Double = {
      val h = (means.size - 1) * q
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      means(lo) + (h - lo) * (means(hi) - means(lo))
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bootMean = means.map(m =>
      BigDecimal(m).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
      means.size.toDouble
    assert(got.getLong(0) == 50L)
    assert(got.getDouble(1) == r6(49.0 / 2.0))            // mean_full = 24.5
    assert(got.getLong(2) == means.size.toLong)           // n_replicates
    assert(got.getDouble(3) == r6(bootMean))
    assert(got.getDouble(4) == r6(pct(0.025)))
    assert(got.getDouble(5) == r6(pct(0.975)))
    assert(got.getDouble(4) <= got.getDouble(5))
  }

  test("bootstrapMeanCI is partitioning-independent and brackets the mean") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Sampling.bootstrapMeanCI(docs, "doc_id", "n_chars", replicates = 50).head()
    val b = Sampling.bootstrapMeanCI(docs.repartition(7), "doc_id", "n_chars",
      replicates = 50).head()
    assert(a == b)
    // the CI of the mean should bracket the full mean on a benign corpus
    assert(a.getDouble(4) <= a.getDouble(1) && a.getDouble(1) <= a.getDouble(5))
    intercept[IllegalArgumentException](
      Sampling.bootstrapMeanCI(docs, "doc_id", "n_chars", replicates = 5))
    intercept[IllegalArgumentException](
      Sampling.bootstrapMeanCI(docs, "doc_id", "n_chars", loQ = 0.9, hiQ = 0.1))
  }

  test("bootstrapMeanCIByGroup: each group's CI equals the global operator on that slice") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val byGroup = Sampling.bootstrapMeanCIByGroup(docs, "doc_id", "n_chars",
      "lang", replicates = 30)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // weights depend only on (salt, b, id), so the per-group rows must be
    // EXACTLY the global operator run on that group's rows alone
    val langs = docs.select("lang").distinct().as[String].collect()
    langs.foreach { l =>
      val solo = Sampling.bootstrapMeanCI(docs.filter($"lang" === l),
        "doc_id", "n_chars", replicates = 30).head()
      assert(byGroup(l) == Seq(solo.getLong(0), solo.getDouble(1),
        solo.getLong(2), solo.getDouble(3), solo.getDouble(4), solo.getDouble(5)),
        s"group $l diverged from the sliced global run")
    }
    assert(byGroup.keySet == langs.toSet)
  }

  test("mixtureAllocation: saturation, redistribution, and budget edges by hand") {
    def plan(rows: Seq[(String, Long, Long)], b: Long): Map[String, Double] =
      Sampling.mixtureAllocation(rows.toDF("g", "supply", "weight"),
        "g", "supply", "weight", b)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // tiny source saturates; the rest absorbs the remaining budget
    assert(plan(Seq(("a", 10L, 1L), ("b", 100L, 1L)), 60L) ==
      Map("a" -> 10.0, "b" -> 50.0))
    // chained: a saturates, b and c split 200 at weights 1:3
    assert(plan(Seq(("a", 5L, 1L), ("b", 1000L, 1L), ("c", 1000L, 3L)), 205L) ==
      Map("a" -> 5.0, "b" -> 50.0, "c" -> 150.0))
    // budget above total supply: everything saturates
    assert(plan(Seq(("a", 7L, 1L), ("b", 3L, 5L)), 100L) ==
      Map("a" -> 7.0, "b" -> 3.0))
    // zero budget: nothing allocated
    assert(plan(Seq(("a", 7L, 1L), ("b", 3L, 5L)), 0L) ==
      Map("a" -> 0.0, "b" -> 0.0))
    intercept[IllegalArgumentException](
      plan(Seq(("a", 1L, 1L)), -1L))
  }

  test("mixtureAllocation invariants on pseudo-random groups") {
    val rows = (0 until 30).map(i =>
      (s"g$i", ((i * 37 + 11) % 500 + 1).toLong, ((i * 53 + 7) % 9 + 1).toLong))
    val budget = 3000L
    val out = Sampling.mixtureAllocation(rows.toDF("g", "supply", "weight"),
      "g", "supply", "weight", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = out.map(_._4).sum
    val cap = math.min(budget, rows.map(_._2).sum).toDouble
    assert(math.abs(total - cap) < 1e-3, s"total $total vs cap $cap")
    out.foreach { case (g, sup, _, a) =>
      assert(a >= 0 && a <= sup + 1e-9, s"$g: allocation $a out of [0, $sup]") }
    // unsaturated groups share one lambda = alloc/weight
    val lambdas = out.filter { case (_, sup, _, a) => a < sup - 1e-9 }
      .map { case (_, _, w, a) => a / w }
    if (lambdas.nonEmpty)
      assert(lambdas.forall(l => math.abs(l - lambdas.head) < 1e-6),
        s"unsaturated groups disagree on lambda: ${lambdas.toSeq}")
  }
}
