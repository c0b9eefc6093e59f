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

  test("nearDupPairs finds only pairs above threshold") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.9)
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
}
