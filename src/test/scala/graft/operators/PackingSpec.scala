package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: concat-then-chunk bin math in id order (single shard)") {
    // token counts: 3, 4, 2, 5 → running before: 0, 3, 7, 9 → capacity 5
    // bins: 0, 0, 1, 1
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"), (4L, "j k l m n"))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", capacity = 5, shards = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3, r._4)).toSeq ==
      Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("packSequences covers every doc exactly once across shards") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Packing.packSequences(docs, "doc_id", "text", capacity = 256, shards = 8)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    val shards = out.select("shard").distinct().count()
    assert(shards > 1 && shards <= 8)
  }

  test("packedBins: token totals and doc counts reconcile; text concatenated in id order") {
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val bins = Packing.packedBins(docs, "doc_id", "text", capacity = 5, shards = 1)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._2)
    assert(bins.map(_._3).sum == 3)       // n_docs total
    assert(bins.map(_._4).sum == 9)       // n_tokens total
    assert(bins.head._5 == "a b c d e f g") // bin 0 = docs 1,2 in id order
  }
}
