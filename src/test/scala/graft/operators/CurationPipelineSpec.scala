package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end composition of the training-data operators — the pipeline a
  * corpus curation job actually runs: scrub → quality gate → dedup →
  * benchmark decontamination → budgeted selection → train/test split →
  * sequence packing. Each stage is individually oracle-verified; this
  * spec pins that they COMPOSE (schemas line up, row accounting
  * reconciles, determinism survives the chain).
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("scrub -> quality -> dedup -> decontaminate -> select -> split -> pack composes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    val bench = docs.filter($"doc_id" % 211 === 0).select($"doc_id", $"text")

    def chain(): (DataFrame, Long) = {
      val scrubbed = TextAnalysis.scrub(docs, "doc_id", "text")
        .select($"doc_id", $"scrubbed".as("text"))
      val quality = scrubbed.join(
        TextAnalysis.textStats(scrubbed, "doc_id", "text")
          .filter($"n_tokens" >= 5).select("doc_id"), Seq("doc_id"), "left_semi")
      val deduped = Dedup.dedupCorpus(quality, "doc_id", "text", minJaccard = 0.5)
      val decon = Dedup.decontaminate(deduped, bench, "doc_id", "text", n = 3)
      val toks = split($"text", " ")
      val scored = decon.select($"doc_id", $"text",
        (size(array_distinct(toks)).cast("double") / size(toks)).as("score"),
        size(toks).cast("long").as("n_tokens"))
      val selected = Selection.selectUnderBudget(
        scored, "doc_id", "score", "n_tokens", budget = 5000L)
      val (train, _) = Sampling.trainTestSplit(
        selected.select("doc_id", "text"), "doc_id", testPermille = 200)
      (Packing.packSequences(train, "doc_id", "text", capacity = 256, shards = 4),
        selected.count())
    }

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

    // decontamination removes the benchmark-overlapping docs, nothing else
    val decon = Dedup.decontaminate(deduped, bench, "doc_id", "text", n = 3)
    val nDecon = decon.count()
    assert(nDecon > 0 && nDecon <= nDeduped)

    // budget selection keeps a nonempty greedy prefix within the budget
    val toks = split($"text", " ")
    val scored = decon.select($"doc_id", $"text",
      (size(array_distinct(toks)).cast("double") / size(toks)).as("score"),
      size(toks).cast("long").as("n_tokens"))
    val selected = Selection.selectUnderBudget(
      scored, "doc_id", "score", "n_tokens", budget = 5000L)
    val nSelected = selected.count()
    assert(nSelected > 0 && nSelected <= nDecon)
    assert(selected.agg(sum($"n_tokens")).as[Long].head() <= 5000L)

    val (train, test) = Sampling.trainTestSplit(
      selected.select("doc_id", "text"), "doc_id", testPermille = 200)
    assert(train.count() + test.count() == nSelected)

    val packed = Packing.packSequences(train, "doc_id", "text", capacity = 256, shards = 4)
    assert(packed.count() == train.count())
    assert(packed.select("doc_id").distinct().count() == train.count())

    // deterministic end to end: the same chain yields the same survivors
    val (again, nSelectedAgain) = chain()
    assert(nSelectedAgain == nSelected)
    assert(again.as[(Long, Long, Long, Long)].collect().sorted.toSeq ==
      packed.as[(Long, Long, Long, Long)].collect().sorted.toSeq)
  }
}
