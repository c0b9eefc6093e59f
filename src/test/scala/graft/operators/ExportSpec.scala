package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExportSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with planted work for every export stage: two good docs,
  // one exact copy of doc 1 at a HIGHER id (dedup must keep 1), and one
  // digit-junk doc (no letters, low unique fraction — the gate drops it)
  private lazy val goodA = (1 to 40).map(i => s"word$i").mkString(" ")
  private lazy val goodB = (1 to 40).map(i => s"tok${i % 25} note").mkString(" ")
  private lazy val corpus = Seq(
    (1L, goodA),
    (2L, goodB),
    (50L, goodA),                       // exact copy of 1
    (60L, Seq.fill(40)("11").mkString(" "))  // junk: gate drops
  ).toDF("doc_id", "text")

  test("trainingExport: gate drops junk, dedup keeps the lower-id copy, shards cover survivors exactly") {
    val out = Export.trainingExport(corpus, "doc_id", "text", nShards = 4,
      salt = "s1").cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L),
      s"survivors must be the canonical good docs, got $ids")
    // token accounting: whitespace counts of the surviving texts (goodB
    // carries two words per element — 80 tokens)
    val toks = out.select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(toks(1L) == 40L && toks(2L) == 80L)
    // the layout is assignShards' deal over exactly the survivors
    val want = Sampling.assignShards(
      corpus.filter($"doc_id".isin(1L, 2L)).select("doc_id"),
      "doc_id", nShards = 4, salt = "s1")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    val got = out.select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    out.unpersist()
  }

  test("trainingExport is partitioning-independent (same shards and positions at any layout)") {
    val a = Export.trainingExport(corpus, "doc_id", "text", 4, "s1")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Export.trainingExport(corpus.repartition(7), "doc_id", "text", 4, "s1")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("a fresh salt re-deals shards but never changes the survivor set") {
    val e1 = Export.trainingExport(corpus, "doc_id", "text", 4, "epoch1")
    val e2 = Export.trainingExport(corpus, "doc_id", "text", 4, "epoch2")
    assert(e1.select("doc_id").as[Long].collect().toSet ==
      e2.select("doc_id").as[Long].collect().toSet)
  }

  test("exportShardReport sums docs and tokens per shard") {
    val exp = Export.trainingExport(corpus, "doc_id", "text", 2, "s1")
    val rep = Export.exportShardReport(exp)
      .as[(Long, Long, Long)].collect()
    assert(rep.map(_._2).sum == 2L, "two surviving docs across all shards")
    assert(rep.map(_._3).sum == 120L, "40 + 80 tokens across the survivors")
  }

  test("trainingExportNearDup: survivors are exactly gate ∘ dedupCorpus; near-dups weld where exact dedup cannot") {
    // doc 3 is a NEAR copy of doc 1 (one token changed): exact dedup
    // keeps both, the near-dup stage must weld them and keep id 1
    val nearCopy = (goodA.split(" ").init :+ "CHANGED").mkString(" ")
    val c = corpus.unionByName(Seq((3L, nearCopy)).toDF("doc_id", "text"))
    val out = Export.trainingExportNearDup(c, "doc_id", "text",
      minJaccard = 0.5, nShards = 4, salt = "s1")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L),
      s"near copy and exact copy both weld to doc 1, junk gated: got $ids")
    // the exact-only export keeps the near copy — the variant's delta
    val exactIds = Export.trainingExport(c, "doc_id", "text", 4, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(exactIds == Set(1L, 2L, 3L))
    // composition contract: survivors == dedupCorpus over the gated set
    val gated = c.filter(!$"doc_id".isin(60L))
    val want = Dedup.dedupCorpus(gated, "doc_id", "text", minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == want)
  }

  test("writeShards: one directory per shard; reading a shard back in pos order reproduces the export") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exp = Export.trainingExport(docs, "doc_id", "text", nShards = 4,
      salt = "s1").localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft-shards-").toString
    Export.writeShards(exp, dir)
    val dirs = new java.io.File(dir).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == (0 until 4).map(k => s"shard=$k").toSet,
      s"one partition directory per shard, got $dirs")
    val back = spark.read.parquet(dir)
      .select($"doc_id", $"shard".cast("long"), $"pos", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(back == exp.as[(Long, Long, Long, Long)]
      .collect().toSet && back.nonEmpty)
    // a single shard read back in pos order is gap-free from 0
    val s0 = spark.read.parquet(s"$dir/shard=0").orderBy("pos")
      .select("pos").as[Long].collect()
    assert(s0.sameElements(s0.indices.map(_.toLong)))
  }

  test("dedup runs AFTER the gate: a junk copy of a kept doc cannot shadow it") {
    // doc 9 is a LOWER-id junk row; doc 10 is good. If dedup ran first
    // on the raw corpus they would not collide (different text), but a
    // gate-then-dedup pipeline must still keep 10 — and the junk row
    // must not survive anywhere.
    val c = Seq(
      (9L, Seq.fill(40)("11").mkString(" ")),
      (10L, goodA)
    ).toDF("doc_id", "text")
    val ids = Export.trainingExport(c, "doc_id", "text", 2, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(10L))
  }
}
