package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.SparkSpec

class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = java.nio.file.Files.createTempDirectory("corpus-ingest").toString

  test("dedupOnIngest drops in-stream and against-corpus exact duplicates") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val existing = Seq((100L, "already in the corpus")).toDF("doc_id", "text")
    val src = s"$tmp/ingest-src"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "fresh document one"),
      (2L, Timestamp.valueOf("2024-01-01 00:01:00"), "already in the corpus"), // dup of existing
      (3L, Timestamp.valueOf("2024-01-01 00:02:00"), "fresh document two"),
      (4L, Timestamp.valueOf("2024-01-01 00:03:00"), "fresh document two")     // in-stream dup of 3
    ).toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(schema).parquet(src)
    val q = CorpusIngest.dedupOnIngest(stream, existing, "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("ingest_out").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("ingest_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L))
    } finally q.stop()
  }
}
