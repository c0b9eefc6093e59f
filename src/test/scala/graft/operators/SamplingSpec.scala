package graft.operators

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
}
