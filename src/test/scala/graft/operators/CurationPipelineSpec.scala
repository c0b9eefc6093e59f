package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end composition of the training-data operators — the pipeline a
  * corpus curation job actually runs: scrub → quality gate → dedup →
  * train/test split → sequence packing. Each stage is individually
  * oracle-verified; this spec pins that they COMPOSE (schemas line up,
  * row accounting reconciles, determinism survives the chain).
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("scrub -> quality -> dedupCorpus -> split -> pack composes and reconciles") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()

    val scrubbed = TextAnalysis.scrub(docs, "doc_id", "text")
      .select($"doc_id", $"scrubbed".as("text"))
    assert(scrubbed.count() == total)

    val quality = scrubbed.join(
      TextAnalysis.textStats(scrubbed, "doc_id", "text")
        .filter($"n_tokens" >= 5).select("doc_id"), Seq("doc_id"), "left_semi")
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= total)

    val deduped = Dedup.dedupCorpus(quality, "doc_id", "text", minJaccard = 0.5)
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= nQuality)

    val (train, test) = Sampling.trainTestSplit(deduped, "doc_id", testPermille = 200)
    assert(train.count() + test.count() == nDeduped)

    val packed = Packing.packSequences(train, "doc_id", "text", capacity = 256, shards = 4)
    assert(packed.count() == train.count())
    assert(packed.select("doc_id").distinct().count() == train.count())

    // deterministic end to end: the same chain yields the same survivors
    val again = Packing.packSequences(
      Sampling.trainTestSplit(
        Dedup.dedupCorpus(quality, "doc_id", "text", minJaccard = 0.5),
        "doc_id", testPermille = 200)._1,
      "doc_id", "text", capacity = 256, shards = 4)
    assert(again.as[(Long, Long, Long, Long)].collect().sorted.toSeq ==
      packed.as[(Long, Long, Long, Long)].collect().sorted.toSeq)
  }
}
