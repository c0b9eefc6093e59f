package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-stream-").toString

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private lazy val batch = Seq(
    (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
    (Timestamp.valueOf("2024-01-01 00:50:00"), "click", 2.0),
    (Timestamp.valueOf("2024-01-01 01:10:00"), "view", 3.0)
  ).toDF("ts", "event_type", "value")

  test("batch windowedAgg buckets into tumbling hours") {
    val out = EventStreams.windowedAgg(batch).orderBy("ws", "event_type")
      .select($"ws".cast("string"), $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect()
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00", "click", 2L, 3.0),
      ("2024-01-01 01:00:00", "view", 1L, 3.0)))
  }

  test("streaming twin over a file source produces the same frame via memory sink") {
    val src = s"$tmp/events"
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    val q = EventStreams.runToMemory(
      EventStreams.streamingWindowedAgg(spark, src, schema), "stream_out")
    try {
      val got = spark.table("stream_out").orderBy("ws", "event_type")
        .select($"ws".cast("string"), $"event_type", $"n")
        .as[(String, String, Long)].collect()
      assert(got.toSeq == Seq(
        ("2024-01-01 00:00:00", "click", 2L),
        ("2024-01-01 01:00:00", "view", 1L)))
    } finally q.stop()
  }
}
