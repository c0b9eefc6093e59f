package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-on-ingest for a streaming document corpus — the streaming twin of
  * the batch daily-ingest shape (`Dedup.dropDuplicatesAgainst`'s exact
  * half, cf. operators/Dedup.scala).
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
}
