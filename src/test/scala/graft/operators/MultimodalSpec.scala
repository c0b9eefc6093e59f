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

  test("sampleFrames keeps every stride-th fixed-width frame") {
    val blob = Array.tabulate(10)(_.toByte) // 10 bytes, frameBytes=3 → frames 0..3
    val media = Seq(Multimodal.MediaRow(7L, "video", blob)).toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 3, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2)) // frames 0 and 2 of 4
    assert(frames(0).frame.toSeq == Seq[Byte](0, 1, 2))
    assert(frames(1).frame.toSeq == Seq[Byte](6, 7, 8))
  }

  test("resize bounds payload size, preserves rows, and passes small blobs through") {
    val big = Multimodal.MediaRow(1L, "image", Array.tabulate(5000)(_.toByte))
    val small = Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3))
    val out = Multimodal.resize(Seq(big, small).toDS(), targetBytes = 1024)
      .collect().sortBy(_.doc_id)
    assert(out.length == 2)
    assert(out(0).blob.length == 1024)
    assert(out(1).blob.toSeq == Seq[Byte](1, 2, 3))
    // deterministic
    val again = Multimodal.resize(Seq(big).toDS(), targetBytes = 1024).collect().head
    assert(out(0).blob.sameElements(again.blob))
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
