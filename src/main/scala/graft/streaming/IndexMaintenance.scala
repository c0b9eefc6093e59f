package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Similarity, TextAnalysis}

/** Streaming INDEX MAINTENANCE — the lifecycle verbs composed onto
  * Structured Streaming: a vector stream grows a persisted IVF-PQ index
  * batch by batch (FAISS's add, as micro-batches), and every batch
  * prices quantization/vocabulary drift into a monitor RELATION whose
  * `retrain`/`rebuild` bit is the operational signal — data, not a log
  * line.
  *
  * Why `foreachBatch` and not streaming operators: encoding against
  * FROZEN codebooks has no event-time semantics — the batch verbs
  * ([[graft.operators.Similarity.ivfPqEncode]],
  * [[graft.operators.Similarity.ivfDriftReport]]) are the right
  * formulation per micro-batch, the same rule
  * [[CorpusIngest.startNearDupIngest]] established for LSH dedup.
  *
  * The SAVED index stays IMMUTABLE: streamed codes land in a separate
  * `deltaDir` partitioned by batch id, and [[loadMaintainedIndex]]
  * reopens base + delta as one index ([[graft.operators.Similarity
  * .ivfPqIndexAdd]] semantics at open). Mutating the saved `codes`
  * directory in place would break the loader's recount contract and mix
  * partition depths; compaction, when wanted, is
  * [[compactMaintainedIndex]] — one [[graft.operators.Similarity
  * .ivfPqIndexSave]] of the maintained index, after which the deltas
  * are retirable.
  */
object IndexMaintenance {

  /** Grow a persisted IVF-PQ index from a vector STREAM and gate drift
    * per batch. Each micro-batch:
    *
    *   1. encodes against the index's FROZEN codebooks
    *      ([[graft.operators.Similarity.ivfPqEncode]] — zero training
    *      jobs reachable, width-mismatched batches refused at encode)
    *      and writes the codes-relation rows as an OVERWRITTEN
    *      `deltaDir/batch=<id>` partition, so a crash-replayed batch
    *      rewrites its own directory instead of double-appending
    *      (exactly-once delta content under at-least-once batch
    *      delivery);
    *   2. prices the batch's coarse-cell occupancy drift against the
    *      OPEN-TIME index snapshot
    *      ([[graft.operators.Similarity.ivfDriftReport]]) and writes
    *      one summary row `(batch_id, n_batch, tv, retrain)` as an
    *      OVERWRITTEN `monitorDir/batch=<id>` partition (the delta
    *      write's idempotence rule — a crash-replayed batch rewrites
    *      its own monitor row instead of double-appending, so the
    *      monitor relation is exactly-once like the deltas) —
    *      `retrain = tv > tvThreshold`, the measured "stop adding,
    *      rebuild the codebooks" signal. Operational note: a
    *      long-running stream accretes one small file per batch in
    *      BOTH `deltaDir` and `monitorDir`; compaction is
    *      [[compactMaintainedIndex]] for the codes and
    *      [[compactMonitor]] for the monitor relations (consumers read
    *      either layout identically).
    *
    * The drift BASELINE is deliberately the index as OPENED (the
    * codebooks' training-time occupancy proxy), not the growing delta:
    * drift of arriving data against the frozen quantizer is what
    * predicts recall rot; a self-updating baseline would mask exactly
    * the slow drift this gate exists to catch.
    *
    * 100 TB shape: per batch, one narrow encode pass over the batch
    * (literal-codebook expressions, no exchange), one batch-sized
    * groupBy for the drift side, nCentroids-sized arithmetic, and one
    * partition-dir write — the stream never touches the corpus or the
    * existing codes, and no Lloyd barrier is reachable from this loop.
    */
  def startIndexMaintenance(spark: SparkSession, indexDir: String,
                            deltaDir: String, stream: DataFrame,
                            idCol: String, vecCol: String,
                            checkpointDir: String, monitorDir: String,
                            tvThreshold: Double = 0.25): StreamingQuery = {
    val index = Similarity.ivfPqIndexLoad(spark, indexDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Similarity.ivfPqEncode(index, batch, idCol, vecCol)
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$deltaDir/batch=$batchId")
          Similarity.ivfDriftReport(index, batch, idCol, vecCol, tvThreshold)
            .agg(sum(col("n_batch")).as("n_batch"),
              max(col("tv")).as("tv"), max(col("retrain")).as("retrain"))
            .select(lit(batchId).as("batch_id"), col("n_batch"),
              col("tv"), col("retrain"))
            .write.mode(SaveMode.Overwrite).parquet(s"$monitorDir/batch=$batchId")
        }
        ()
      }
      .start()
  }

  /** Reopen a maintained index: the immutable base
    * ([[graft.operators.Similarity.ivfPqIndexLoad]] — all its fail-fast
    * cross-checks apply) plus every streamed delta batch, unioned into
    * one codes relation — [[graft.operators.Similarity.ivfPqIndexAdd]]
    * semantics at open, bit-identical to having encoded the streamed
    * rows at build time (the encode parity contract). A maintained
    * index with no deltas yet opens as the base.
    */
  def loadMaintainedIndex(spark: SparkSession, indexDir: String,
                          deltaDir: String): Similarity.IvfPqIndex = {
    val base = Similarity.ivfPqIndexLoad(spark, indexDir)
    val p = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) base
    else {
      // fail fast on a foreign parquet in deltaDir: the base loader
      // validates everything IT opens, so the delta side validates too —
      // name-AND-type equality with the base codes schema (a
      // same-named-but-int-typed column would otherwise coerce silently
      // through the union into wrong ADC lookups)
      val delta = spark.read.parquet(deltaDir).drop("batch")
      val baseTypes = base.codes.schema.map(f => f.name -> f.dataType).toMap
      val deltaTypes = delta.schema.map(f => f.name -> f.dataType).toMap
      require(deltaTypes == baseTypes,
        s"$deltaDir does not hold this index's codes schema: expected " +
          s"$baseTypes, got $deltaTypes — a foreign parquet in the delta " +
          "directory")
      base.copy(codes = base.codes.unionByName(
        delta.select(base.codes.columns.map(col).toIndexedSeq: _*)))
    }
  }

  /** COMPACT a maintained index: one [[graft.operators.Similarity
    * .ivfPqIndexSave]] of the maintained view into `outDir` — the codes
    * relation lands as one partitioned parquet write instead of
    * base + one small delta file per micro-batch, and the save's meta
    * recount makes the new directory a self-validating standalone index
    * ([[graft.operators.Similarity.ivfPqIndexLoad]] reopens it with no
    * knowledge of the stream). After the save the deltas are RETIRABLE:
    * the compacted index alone serves what base+deltas served
    * (spec-pinned row-for-row). `outDir` must differ from `indexDir` —
    * compacting in place would overwrite the base codes while the plan
    * is still reading them.
    */
  def compactMaintainedIndex(spark: SparkSession, indexDir: String,
                             deltaDir: String, outDir: String): Unit = {
    require(outDir != indexDir && outDir != deltaDir,
      s"compaction must write to a fresh directory, got outDir=$outDir")
    Similarity.ivfPqIndexSave(loadMaintainedIndex(spark, indexDir, deltaDir),
      outDir)
  }

  /** COMPACT a monitor relation — the hygiene twin of
    * [[compactMaintainedIndex]] for the `batch=<id>` partition
    * directories both monitor streams accrete (one small file per
    * micro-batch): one read-rewrite of the whole directory into
    * `outDir` as a single plain parquet write, the partition column
    * dropped (each row already carries `batch_id`). Row-for-row equal
    * to the maintained directory (spec-pinned); consumers read either
    * layout identically. In-place compaction is refused — it would
    * overwrite partitions the plan is still reading.
    */
  def compactMonitor(spark: SparkSession, monitorDir: String,
                     outDir: String): Unit = {
    require(outDir != monitorDir,
      s"compaction must write to a fresh directory, got outDir=$outDir")
    spark.read.parquet(monitorDir).drop("batch")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** The lexical twin — a DOCUMENT stream against a frozen
    * [[graft.operators.TextAnalysis.SparseIndex]]: the sparse lifecycle
    * has NO add verb by design (df/N/avgdl are global — see the
    * SparseIndex scaladoc), so the streaming composition is the GATE
    * alone: every micro-batch prices its OOV df-mass and df-share TV
    * distance against the frozen vocabulary
    * ([[graft.operators.TextAnalysis.sparseDriftReport]]) and writes
    * `(batch_id, n_batch_terms, n_oov_terms, oov_mass, tv, rebuild)` as
    * an overwritten `monitorDir/batch=<id>` partition (exactly-once
    * monitor rows under at-least-once batch delivery) — the operational
    * answer to "when must this index be rebuilt", maintained
    * continuously instead of discovered as ranking rot.
    *
    * 100 TB shape: per batch, one tokenize+distinct pass over the batch
    * plus a vocabulary-sized share join against the index's posting df
    * relation — the corpus is never rescanned.
    */
  def startSparseDriftMonitor(spark: SparkSession, indexDir: String,
                              stream: DataFrame, idCol: String,
                              textCol: String, checkpointDir: String,
                              monitorDir: String,
                              oovThreshold: Double = 0.2,
                              tvThreshold: Double = 0.25): StreamingQuery = {
    val index = TextAnalysis.sparseIndexLoad(spark, indexDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          TextAnalysis.sparseDriftReport(index, batch, idCol, textCol,
              oovThreshold, tvThreshold)
            .select(lit(batchId).as("batch_id"), col("n_batch_terms"),
              col("n_oov_terms"), col("oov_mass"), col("tv"), col("rebuild"))
            .write.mode(SaveMode.Overwrite).parquet(s"$monitorDir/batch=$batchId")
        }
        ()
      }
      .start()
  }
}
