package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end TRAINING EXPORT composition — the "corpus in, training
  * shards out" verb this engine exists for, assembled from its own
  * independently-graded parts: quality gate → exact dedup → token
  * accounting → deterministic shard layout. Each stage is the operator
  * a production pipeline would run standalone
  * ([[TextAnalysis.qualityClassify]], [[Dedup.exactGroups]]'s digest
  * convention, [[Sampling.assignShards]]); composing them here pins the
  * stage ORDER and the inter-stage contracts (gate before dedup — a
  * dropped low-quality copy must not shadow a kept canonical; dedup
  * before sharding — shard sizes account only rows a loader will read).
  */
object Export {

  /** One relation `(id, shard, pos, n_tokens)`: the documents that pass
    * the [[TextAnalysis.qualityClassify]] gate (score > 0.5 on the
    * default weights) and survive exact content dedup (minimum id per
    * sha-256 text digest — [[Dedup.exactGroups]]'s canonical pick),
    * dealt into `nShards` reproducible shards with a stable in-shard
    * position ([[Sampling.assignShards]] — salted content-hash shard,
    * (hash, id) order), each row carrying its whitespace token count
    * for the loader's budget accounting.
    *
    * 100 TB shape, stage by stage: the gate is per-row and narrow (scan
    * speed); dedup is ONE digest hash-aggregation (map-side combinable)
    * plus a keyed semi-join of the corpus against the canonical-id set
    * (never a self-join on text); token counting rides the same scan;
    * the shard deal is [[Sampling.assignShards]]'s one hash exchange +
    * in-shard sort, with its nShards sizing rule (≈ corpus / target
    * shard size) unchanged. No stage collects, no stage cross-joins,
    * and every exchange is keyed — the composition adds contracts, not
    * shuffles.
    */
  def trainingExport(docs: DataFrame, idCol: String, textCol: String,
                     nShards: Int, salt: String = ""): DataFrame = {
    // ONE corpus scan end-to-end before the deal: the gate is an
    // in-place narrow filter (qualityGate — not classify + id
    // join-back, which re-scans the corpus), and the canonical pick is
    // a single digest HASH aggregation that carries the survivor's
    // token count out of the groupBy via min_by (primitive buffers, so
    // it hash-aggregates with map-side combine — a min(struct) form
    // measured as SortAggregate: two extra per-partition sorts by
    // digest) — no join back onto the corpus.
    val gated = TextAnalysis.qualityGate(docs, textCol)
      .select(sha2(col(textCol), 256).as("__digest"), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("__nt"))
    val survivors = gated
      .groupBy(col("__digest"))
      .agg(min(col(idCol)).as(idCol),
        min_by(col("__nt"), col(idCol)).as("n_tokens"))
      .select(col(idCol), col("n_tokens"))
    Sampling.assignShards(survivors, idCol, nShards, salt)
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"))
  }

  /** [[trainingExport]] with the dedup stage upgraded to the PRODUCTION
    * near-dup machinery: [[Dedup.dedupCorpus]] (exact digest edges ∪
    * Jaccard-verified MinHash-LSH near edges, closed under connected
    * components, min-id survivor per cluster) replaces the exact-only
    * digest pick. Same gate, same token accounting, same deterministic
    * shard deal; the stage-order contract (gate BEFORE dedup) is
    * unchanged and just as load-bearing — a near-dup cluster must elect
    * its survivor among the docs a loader could actually read.
    *
    * 100 TB shape: inherits [[Dedup.dedupCorpus]]'s banded candidate
    * generation (never all-pairs) and the [[Sampling.assignShards]]
    * exchange; the gate stays narrow. The exact-only
    * [[trainingExport]] remains beside it as the cheap path when the
    * corpus is known near-dup-free.
    */
  def trainingExportNearDup(docs: DataFrame, idCol: String, textCol: String,
                            minJaccard: Double, nShards: Int,
                            salt: String = ""): DataFrame = {
    // the gate is the same in-place narrow filter as [[trainingExport]],
    // but dedupCorpus re-reads its input several times (shingles, LSH
    // bands, Jaccard verification, exact digests, the survivor
    // semi-join) — localCheckpoint the gated (id, text) PROJECTION once
    // so those re-reads replay a materialized snapshot instead of
    // re-running the gate's scan+classify per stage
    val gated = TextAnalysis.qualityGate(docs, textCol)
      .select(col(idCol), col(textCol)).localCheckpoint()
    val survivors = Dedup.dedupCorpus(gated, idCol, textCol, minJaccard)
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    Sampling.assignShards(survivors, idCol, nShards, salt)
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"))
  }

  /** The export's per-shard accounting twin — the QA table a data-loader
    * owner reads before a run: `(shard, n_docs, n_tokens)` per shard
    * over [[trainingExport]]'s output. Groups-sized; one keyed
    * aggregation over the export relation.
    */
  def exportShardReport(export: DataFrame): DataFrame =
    export.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Materialize an export relation (joined back to its payload columns)
    * as the PHYSICAL shard layout a data loader consumes: one
    * `shard=<k>/` directory per shard, rows within each shard's files in
    * `pos` order (parquet preserves within-file row order; `pos` is
    * also kept as a column so a multi-file shard — or a resumed reader —
    * re-establishes the order by sorting a shard-local column, never a
    * global sort).
    *
    * 100 TB shape: ONE exchange — `repartition(shard)` aligns writer
    * tasks with shard directories (without it every task opens a file
    * per shard it sees: nShards × tasks small files) — then an
    * in-partition `(shard, pos)` sort; the [[Sampling.assignShards]]
    * sizing rule (nShards ≈ corpus / target shard size) keeps each
    * task's sort bounded. No global sort, no driver involvement.
    */
  def writeShards(export: DataFrame, path: String): Unit =
    export.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
}
