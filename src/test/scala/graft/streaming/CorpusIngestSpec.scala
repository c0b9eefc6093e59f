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

  test("startNearDupIngest drops a near-dup arriving micro-batches after its partner") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val src = s"$tmp/neardup-src"
    val corpus = s"$tmp/neardup-corpus"
    val ckpt = s"$tmp/neardup-ckpt"
    def corpusIds: Seq[Long] = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // batch 1: two distinct docs (one also near-dups the other batch's doc)
    Seq((1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely different content about spark partitions here"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = CorpusIngest.startNearDupIngest(stream, corpus, ckpt,
      "doc_id", "text", minJaccard = 0.5)
    try {
      q.processAllAvailable()
      assert(corpusIds == Seq(1L, 2L))
      // batch 2, a LATER micro-batch: an exact dup of doc 1, a near-dup of
      // doc 1 (one token changed), an intra-batch near-dup pair, one fresh
      Seq((3L, "the quick brown fox jumps over the lazy dog today"),   // exact dup of 1
          (4L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
          (5L, "brand new unrelated document body arriving in batch two"),
          (6L, "brand new unrelated document body arriving in batch too")) // near-dup of 5
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(corpusIds == Seq(1L, 2L, 5L),
        "exact dup 3 and near-dup 4 must fall to the batch-1 partner; " +
          "intra-batch near-dup 6 must fall to 5")
    } finally q.stop()
  }
}
