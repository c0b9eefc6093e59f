package graft.operators

import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import graft.SparkSpec

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side single-string reference with the same settings — the
    * plumbing oracle for the distributed kernel (UTF-8 encoding, per-row
    * reset correctness, partition batching).
    */
  private def refDeflate(text: String, level: Int = 6): (Long, Long) = {
    val raw = text.getBytes(StandardCharsets.UTF_8)
    val d = new Deflater(level, false)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    (raw.length.toLong, n)
  }

  test("compressionSignals matches the single-string reference per row, under repartition") {
    val texts = Seq(
      1L -> ("ab " * 500).trim,                    // highly repetitive
      2L -> (0 until 500).map(i => (i * 2654435761L % 9973).toString).mkString(" "),
      3L -> "short",
      4L -> "naïve café — UTF-8 multibyte ≠ char count",
      5L -> ("x" * 10000))
    val df = texts.toDF("doc_id", "text").repartition(5)
    val got = Compression.compressionSignals(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.size == texts.size)
    got.zip(texts).foreach { case ((id, raw, defl, ratio), (refId, text)) =>
      val (rRaw, rDefl) = refDeflate(text)
      assert(id == refId)
      assert(raw == rRaw, s"doc $id raw bytes")
      assert(defl == rDefl, s"doc $id deflate bytes")
      val expect = BigDecimal(rDefl.toDouble / rRaw.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ratio == expect, s"doc $id ratio")
    }
    // the redundancy signal itself: boilerplate compresses far below the
    // varied-number doc, and the constant run below both
    val byId = got.map(r => r._1 -> r._4).toMap
    assert(byId(5L) < byId(1L) && byId(1L) < byId(2L))
    assert(byId(5L) < 0.01 && byId(2L) > 0.3)
  }

  test("compressionSignals drops null and empty text and validates the level") {
    val df = Seq((1L, "ok"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Compression.compressionSignals(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
    intercept[IllegalArgumentException](
      Compression.compressionSignals(df, "doc_id", "text", level = 0))
  }
}
