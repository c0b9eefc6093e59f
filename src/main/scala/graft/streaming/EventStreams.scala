package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface: the snapshot-append pattern of the EPSS
  * feed (daily batch files landing in a directory) and the events stream
  * both map to `readStream` over a file source + watermarked windowed
  * aggregation. The batch twin (`windowedAgg`) is the oracle-checked query
  * (SparkEntry q29); the streaming twin produces the same frame via the
  * memory sink in tests.
  */
object EventStreams {

  /** Batch twin: tumbling-window counts + exact (decimal) value sums. */
  def windowedAgg(events: DataFrame, duration: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming twin: file-source stream with a watermark. */
  def streamingWindowedAgg(spark: SparkSession, srcDir: String, schema: StructType,
                           duration: String = "1 hour"): DataFrame =
    windowedAggOn(
      spark.readStream.schema(schema).parquet(srcDir), duration)

  private def windowedAggOn(events: DataFrame, duration: String): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))

  /** Run a streaming frame to completion against the memory sink (local
    * smoke path: a directory of parquet drives the stream synchronously).
    */
  def runToMemory(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
