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

  test("score -> conformal gate -> per-source CI -> regression -> vocab curve composes") {
    // the EVAL/report pipeline a data team runs AFTER curation: every
    // stage is individually oracle-verified; this pins that the fifth
    // wave's operators compose and their numbers reconcile
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"text".isNotNull)
    val toks = split($"text", " ")
    val scored = docs.select($"doc_id", $"text", $"source", $"n_chars",
      (size(array_distinct(toks)).cast("double") / size(toks)).as("score"))
    val n = scored.count()

    // conformal audit: the out-of-sample keep fraction lands near the
    // intended 20 % on a benign score distribution
    val conf = Selection.conformalCoverageReport(scored, "doc_id", "score",
      calibPermille = 400, keepQuantile = 0.8).head()
    assert(conf.getLong(0) + conf.getLong(1) == n)
    assert(math.abs(conf.getDouble(5)) < 0.15, s"gap too large: $conf")

    // gate the corpus at the calibrated threshold and CI the kept slice
    // per source: group ns reconcile with the kept count
    val thr = conf.getDouble(2)
    val kept = scored.filter($"score" >= thr)
    val ci = Sampling.bootstrapMeanCIByGroup(kept, "doc_id", "n_chars",
      "source", replicates = 30)
    val perGroup = ci.agg(sum($"n")).as[Long].head()
    assert(perGroup == kept.count())
    assert(ci.collect().forall(r =>
      r.isNullAt(5) || r.getDouble(5) <= r.getDouble(6)))

    // regression over the kept slice: sane diagnostics
    val feats = kept.select($"n_chars",
      size(split($"text", " ")).cast("long").as("n_toks"),
      size(array_distinct(split($"text", " "))).cast("long").as("n_distinct"))
    val fit = Regression.linearFit2(feats, "n_chars", "n_toks", "n_distinct").head()
    assert(fit.getLong(0) == kept.count())
    assert(fit.isNullAt(4) || (fit.getDouble(4) <= 1.0))

    // vocab growth on the kept slice: nested and capped by the full corpus
    val curve = TextAnalysis.vocabGrowthCurve(kept, "doc_id", "text",
      Seq(250, 1000)).orderBy("permille")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(curve.last._2 == kept.count())
    assert(curve.head._4 <= curve.last._4)
    val fullVocab = TextAnalysis.vocabGrowthCurve(scored, "doc_id", "text",
      Seq(1000)).as[(Int, Long, Long, Long)].head()._4
    assert(curve.last._4 <= fullVocab)
  }
}
