package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "aaaa"), (1L, "bb"), (2L, "cccccc")
  ).toDF("doc_id", "text")

  test("fakeMediaTable builds typed media rows with deterministic types") {
    val m = Multimodal.fakeMediaTable(docs).collect().sortBy(_.doc_id)
    assert(m.map(_.media_type).toSeq == Seq("image", "audio", "video"))
    assert(m(0).blob.toSeq == "aaaa".getBytes("UTF-8").toSeq)
  }

  test("extractFeatures preserves partitioning shape and is deterministic") {
    val feats = Multimodal.extractFeatures(Multimodal.fakeMediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.map(_.n_bytes).toSeq == Seq(4L, 2L, 6L))
    assert(feats.forall(_.n_frames == 1))
    assert(feats.forall(_.feature.length == 8))
    // deterministic: run twice, same features
    val again = Multimodal.extractFeatures(Multimodal.fakeMediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }
}
