package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Dedup-on-ingest for a streaming document corpus — the streaming twin of
  * the batch daily-ingest shape (`Dedup.dropDuplicatesAgainst`, cf.
  * operators/Dedup.scala).
  */
object CorpusIngest {

  /** Drop an incoming document when its content digest (a) already arrived
    * inside the watermark horizon — `dropDuplicatesWithinWatermark` keys
    * the state store by digest and expires entries as the watermark
    * passes, so state stays BOUNDED regardless of stream length — or (b)
    * exists in the static corpus digest table (stream-static left-anti
    * join: stateless, the static side is an ordinary lookup relation that
    * at scale is the digest table the batch path already maintains).
    *
    * The near-dup half deliberately stays a batch job over the survivors
    * (`Dedup.dropDuplicatesAgainst`): LSH banding + Jaccard verification
    * have no event-time semantics to gain from streaming, and micro-batch
    * output feeds it directly.
    */
  def dedupOnIngest(stream: DataFrame, existing: DataFrame, textCol: String,
                    tsCol: String, horizon: String = "1 hour"): DataFrame = {
    val exHashes = existing.select(sha2(col(textCol), 256).as("__h")).distinct()
    stream.withColumn("__h", sha2(col(textCol), 256))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__h")
      .join(exHashes, Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** NEAR-dup dedup-on-ingest — the micro-batch increment over
    * [[dedupOnIngest]]'s exact half: every micro-batch is (1)
    * intra-batch deduped (exact + LSH-verified near-dups,
    * `Dedup.dedupCorpus`), (2) anti-joined against EVERYTHING ingested so
    * far (`Dedup.dropDuplicatesAgainst` — exact digests plus cross-side
    * band collisions with Jaccard verification), and (3) appended to the
    * corpus store — so a near-duplicate arriving any number of
    * micro-batches after its partner is dropped, which a stream-static
    * join against a frozen band table cannot do.
    *
    * Why `foreachBatch` and not streaming operators: LSH banding +
    * Jaccard verification have no event-time semantics — the batch
    * operators ARE the right formulation per micro-batch, and this is
    * the canonical Structured Streaming pattern for stateful-against-
    * accumulated-output logic. Each batch writes an OVERWRITTEN
    * `batch=<id>` partition, so a replayed batch after a failure
    * rewrites the same directory instead of double-appending
    * (exactly-once corpus content under the file sink's at-least-once
    * batch delivery).
    *
    * Scale: per-batch cost is proportional to the batch on the incoming
    * side (the dropDuplicatesAgainst contract); the existing side's
    * digest/set/band tables are recomputed from the corpus store here —
    * at 100 TB those are materialized incrementally at ingest (the batch
    * scaladoc's recipe) and this loop's read of `corpusDir` becomes a
    * read of those artifact tables.
    */
  def startNearDupIngest(stream: DataFrame, corpusDir: String, checkpointDir: String,
                         idCol: String, textCol: String, minJaccard: Double,
                         n: Int = 2, k: Int = 8, rowsPerBand: Int = 2): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cols = batch.columns.toSeq
        val intra = Dedup.dedupCorpus(batch, idCol, textCol, minJaccard, n, k, rowsPerBand)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val hasCorpus = fs.exists(new org.apache.hadoop.fs.Path(corpusDir))
        // a REPLAYED batch (checkpoint recovery) finds its own previous
        // write in the store — anti-joining against itself would rewrite
        // the partition empty, so the current batch id is excluded
        val fresh =
          if (!hasCorpus) intra
          else Dedup.dropDuplicatesAgainst(intra,
            spark.read.parquet(corpusDir)
              .filter(col("batch") =!= batchId).select(cols.map(col): _*),
            idCol, textCol, minJaccard, n, k, rowsPerBand)
        fresh.select(cols.map(col): _*)
          .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
        ()
      }
      .start()
}
