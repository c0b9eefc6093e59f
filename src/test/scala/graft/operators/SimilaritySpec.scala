package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f))   // opposite of 0
  ).toDF("vec_id", "embedding")

  test("cosine is exact on unit vectors") {
    val c = vecs.filter($"vec_id" === 0).crossJoin(
      vecs.filter($"vec_id" === 2).select($"embedding".as("e2")))
      .select(Similarity.cosine(
        Similarity.asDouble($"embedding"), Similarity.asDouble($"e2")).as("c"))
      .as[Double].head()
    assert(c == 0.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak, self excluded") {
    val topk = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", 3)
      .orderBy("rn").as[(Long, Long, Long)].collect()
    assert(topk.map(_._2).toSeq == Seq(1L, 2L, 3L)) // closest → orthogonal → opposite
    assert(!topk.map(_._2).contains(0L))
  }

  test("nearDupPairsExhaustive finds only pairs above threshold") {
    val pairs = Similarity.nearDupPairsExhaustive(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("bucketed nearDupPairs is a subset of exhaustive, and exact within probe radius") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bucketed = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .as[(Long, Long)].collect().toSet
    val all = Similarity.nearDupPairsExhaustive(emb, "vec_id", "embedding", 0.4)
      .as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(all), "bucketed pairs must all pass the exact threshold")
    assert(bucketed.nonEmpty)
    // losslessness within the probe radius: every exhaustive pair whose
    // buckets differ in <= 1 bit must be found (the blocking drops ONLY
    // pairs outside the radius, never candidates inside it)
    val buckets = emb.select($"vec_id",
      Similarity.lshBucket($"embedding").as("b")).as[(Long, Long)].collect().toMap
    val inRadius = all.filter { case (x, y) =>
      java.lang.Long.bitCount(buckets(x) ^ buckets(y)) <= 1 }
    assert(bucketed == inRadius)
  }

  test("nearDupPairs planes knob: more planes = more buckets, still subset-exact") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = Similarity.nearDupPairsExhaustive(emb, "vec_id", "embedding", 0.4)
      .as[(Long, Long)].collect().toSet
    // planes = 8 -> 256 buckets (the 100 TB widening of the self-join key
    // space); candidates shrink, every survivor still passes the exact
    // threshold, and same-bucket pairs are still found
    val wide = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4, planes = 8)
      .as[(Long, Long)].collect().toSet
    val narrow = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4, planes = 4)
      .as[(Long, Long)].collect().toSet
    assert(wide.subsetOf(all))
    assert(wide.nonEmpty)
    // recall shrinks monotonically in expectation but never gains pairs
    // outside the exhaustive truth; both probe radii stay threshold-exact
    assert(narrow.subsetOf(all))
  }

  test("nearDupPairsAuto sizes planes from the corpus and finds the same pairs") {
    val df = Seq(
      (0L, Array.fill(64)(0.25f)),
      (1L, Array.fill(64)(0.25f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    // 3 vectors -> planesFor floor of 4 planes: identical result to the
    // explicit fixture call
    val auto = Similarity.nearDupPairsAuto(df, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    val explicit = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.9, planes = 4)
      .as[(Long, Long)].collect().toSet
    assert(auto == explicit && auto == Set((0L, 1L)))
  }

  test("integer-element vectors (quantized codes) still work through the bucketed operators") {
    val codes = Seq(
      (0L, Array(100L, -50L, 25L, 0L)),
      (1L, Array(100L, -50L, 25L, 0L)),
      (2L, Array(-100L, 50L, -25L, 1L))
    ).toDF("vec_id", "embedding") // array<bigint>, the quantizeInt8 shape
    val pairs = Similarity.nearDupPairs(codes, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
    assert(Similarity.lshTopK(codes, codes.filter($"vec_id" === 0), "vec_id",
      "embedding", k = 1, probeBits = 1).count() >= 1)
  }

  test("kmeansCodebook ignores null vectors in the sample") {
    val vecs = Seq(
      (0L, Some(Array.fill(8)(0.5f))), (1L, Some(Array.fill(8)(0.5f))),
      (2L, None)
    ).toDF("vec_id", "embedding")
    val cb = Similarity.kmeansCodebook(vecs, "vec_id", "embedding",
      nCentroids = 1, sampleSize = 10, iterations = 2)
    assert(cb.length == 1 && cb.head._2.forall(!_.isNaN))
  }

  test("kmeansCodebook trains deterministic spherical centroids; trained IVF matches brute force") {
    // two tight clusters around orthogonal directions
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array.fill(8)(1.0f) else
        Array.tabulate(8)(j => if (j % 2 == 0) 1.0f else -1.0f)
      (i, base.updated(0, base(0) + (i % 5) * 0.01f))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.kmeansCodebook(vecs, "vec_id", "embedding",
      nCentroids = 2, sampleSize = 40, iterations = 5)
    assert(cb.length == 2 && cb.map(_._1).toSeq == Seq(0L, 1L))
    // deterministic: same call, same centroids
    assert(cb.map(_._2).toSeq == Similarity.kmeansCodebook(vecs, "vec_id", "embedding",
      nCentroids = 2, sampleSize = 40, iterations = 5).map(_._2).toSeq)
    // each trained centroid aligns with one cluster (cosine > 0.99)
    val clusterDirs = Seq(Array.fill(8)(1.0), Array.tabulate(8)(j => if (j % 2 == 0) 1.0 else -1.0))
    cb.foreach { case (_, c) =>
      val best = clusterDirs.map(d =>
        d.zip(c).map { case (a, b) => a * b }.sum /
          (math.sqrt(d.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum))).max
      assert(best > 0.99, s"centroid $c aligns with no cluster")
    }
    // trained-codebook IVF at nProbe=1 finds the same neighbors as brute
    // force: clusters are well-separated, so probing one cell is lossless
    val queries = vecs.filter($"vec_id" < 4)
    val ivf = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", k = 3,
      codebook = cb, nProbe = 1).as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("planesFor keeps the probe-multiplied per-vector load under budget") {
    assert(Similarity.planesFor(0) == 4)       // floor: the fixture default
    // smallest p with (p+1)·n/2^p <= 8 (probeBits=1 => p+1 probe masks)
    assert(Similarity.planesFor(5000) == 14)   // 15·5000/2^14 = 4.6
    assert(Similarity.planesFor(500000) == 21) // 22·500k/2^21 = 5.2
    assert(Similarity.planesFor(5000000) == 24) // cap
    assert(Similarity.planesFor(Long.MaxValue) == 24) // cap
    // doubling n adds one plane while under the cap: 2^planes tracks n
    assert(Similarity.planesFor(1000000) == Similarity.planesFor(500000) + 1)
    // wider probing costs more masks, so the same n needs more planes
    assert(Similarity.planesFor(500000, probeBits = 2) >
      Similarity.planesFor(500000, probeBits = 1))
    // past-the-cap corpora: raising maxPlanes alongside probeBits keeps
    // sizing (the documented 28/2-bit recipe for >5M vectors)
    assert(Similarity.planesFor(50000000L, probeBits = 2, maxPlanes = 28) == 28)
    assert(Similarity.planesFor(5000000) == 24) // default cap unchanged
  }

  test("identical vectors always share a bucket, so bucketed near-dup finds them") {
    val df = Seq(
      (0L, Array.fill(64)(0.25f)),
      (1L, Array.fill(64)(0.25f)),
      (2L, Array.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.99)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("lshBucket is deterministic and stable") {
    val dim = 64
    val df = Seq((0L, Array.fill(dim)(0.5f)), (1L, Array.fill(dim)(0.5f)))
      .toDF("vec_id", "embedding")
    val buckets = df.select(Similarity.lshBucket($"embedding").as("b")).as[Long].collect()
    assert(buckets(0) == buckets(1))        // identical vectors ⇒ same bucket
    assert(buckets(0) >= 0 && buckets(0) < 16)
  }

  test("ivfTopK with nProbe = nCentroids equals brute force exactly") {
    val dim = 16
    val base = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 7 + j * 3) % 11 - 5) * 0.1f))
    }
    val df = base.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 3)
    val ivf = Similarity.ivfTopK(df, qs, "vec_id", "embedding", k = 5,
      nCentroids = 4, nProbe = 4)
      .orderBy("query_id", "rn").as[(Long, Long, Long)].collect().toSeq
    val brute = Similarity.bruteForceTopK(df, qs, "vec_id", "embedding", 5)
      .orderBy("query_id", "rn").as[(Long, Long, Long)].collect().toSeq
    assert(ivf == brute)
  }

  test("ivfTopK with nProbe < nCentroids returns a brute-force-consistent subset") {
    val dim = 16
    val base = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 7 + j * 3) % 11 - 5) * 0.1f))
    }
    val df = base.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" === 0)
    val ivf = Similarity.ivfTopK(df, qs, "vec_id", "embedding", k = 5,
      nCentroids = 8, nProbe = 2)
      .orderBy("rn").as[(Long, Long, Long)].collect().map(_._2).toSeq
    val brute = Similarity.bruteForceTopK(df, qs, "vec_id", "embedding", 29)
      .orderBy("rn").as[(Long, Long, Long)].collect().map(_._2).toSeq
    // returned neighbors appear in brute-force order
    assert(ivf == brute.filter(ivf.contains(_)).take(ivf.length))
    assert(ivf.nonEmpty)
  }

  test("multi-probe lshTopK widens the candidate set, still brute-force-consistent") {
    val dim = 64
    val base = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i % 4) 1.0f else 0.01f * ((i + j) % 7)))
    }
    val df = base.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" === 0)
    def neighbors(probeBits: Int): Seq[Long] =
      Similarity.lshTopK(df, qs, "vec_id", "embedding", k = 39, probeBits = probeBits)
        .orderBy("rn").as[(Long, Long, Long)].collect().map(_._2).toSeq
    val n0 = neighbors(0)
    val n1 = neighbors(1)
    assert(n1.size >= n0.size)
    assert(n0.toSet.subsetOf(n1.toSet))
    val brute = Similarity.bruteForceTopK(df, qs, "vec_id", "embedding", 39)
      .orderBy("rn").as[(Long, Long, Long)].collect().map(_._2).toSeq
    assert(n1 == brute.filter(n1.contains(_)).take(n1.length))
  }

  test("lshTopK returns same-bucket neighbors ranked like brute force") {
    val dim = 64
    val base = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i % 4) 1.0f else 0.01f * ((i + j) % 7)))
    }
    val df = base.toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(df, df.filter($"vec_id" === 0), "vec_id", "embedding", 5)
      .as[(Long, Long, Long)].collect()
    // candidates restricted to bucket ⇒ a subset of brute-force ranking
    val brute = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 0),
      "vec_id", "embedding", 19).as[(Long, Long, Long)].collect()
      .map(_._2).toSeq
    val got = out.sortBy(_._3).map(_._2).toSeq
    assert(got == brute.filter(got.contains(_)).take(got.length))
  }

  test("normalize yields unit vectors; zero vector passes through") {
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 0.0))).toDF("id", "v")
    val out = df.select($"id", Similarity.normalize($"v").as("nv"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(0.6, 0.8))
    assert(out(2L) == Seq(0.0, 0.0))
  }

  test("quantizeInt8 maps max-abs component to +/-127 and stays in range") {
    val df = Seq((1L, Seq(0.5, -1.0, 0.25))).toDF("id", "v")
    val q = df.select(Similarity.quantizeInt8($"v").as("q"))
      .as[Seq[Long]].head()
    assert(q == Seq(64L, -127L, 32L))
    assert(q.forall(x => x >= -127 && x <= 127))
  }

  test("quantizedRerankTopK with full rerank budget equals brute force") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter($"vec_id" % 20 === 0)
    val full = Similarity.quantizedRerankTopK(emb, qs, "vec_id", "embedding",
      k = 5, rerank = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(full == brute && brute.nonEmpty)
  }

  test("quantizedRerankTopK at a tight budget keeps high recall vs brute force") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter($"vec_id" % 20 === 0)
    val approx = Similarity.quantizedRerankTopK(emb, qs, "vec_id", "embedding",
      k = 5, rerank = 20).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }
}
