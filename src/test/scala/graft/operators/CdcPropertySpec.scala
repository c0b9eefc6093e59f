package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property checks for the content-defined chunking family on RANDOM
  * token sequences — tiny vocabularies (heavy repeated grams, so cut
  * positions collide and cluster), lengths straddling the n-gram minimum,
  * and random prefix/suffix edits. The fixed cases in TextAnalysisSpec
  * pin known edges; this sweeps the space.
  *
  * Properties:
  *   1. PARTITION: chunks reassemble to the exact document, indices are
  *      dense 0..k-1, token counts add up — for every doc, at any
  *      avgTokens, on both hash paths.
  *   2. LOCALITY: a prefix edit leaves every chunk after the edited
  *      doc's first boundary byte-identical (the CDC contract).
  *   3. REFERENCE EQUIVALENCE: dedupChunks matches an independent
  *      driver-side implementation of "first occurrence by (id, idx)
  *      wins, rebuild survivors in order" over the same chunk stream.
  *      (Idempotence is deliberately NOT claimed: rebuilding a document
  *      from surviving chunks creates new seam grams, so a second pass
  *      chunks differently by design.)
  */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  private val docsGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(1, 12)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(1, 120)
      toks <- Gen.listOfN(len, Gen.choose(0, 8).map(v => s"w$v")) // 9-token vocab
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("CDC partitions every random doc losslessly (both hash paths, two avgTokens)") {
    (0 until 12).foreach { i =>
      val docs = docsGen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = docs.toDF("doc_id", "text")
      for (portable <- Seq(true, false); avg <- Seq(4, 16)) {
        val out = TextAnalysis
          .contentDefinedChunks(df, "doc_id", "text", avgTokens = avg, portable = portable)
          .orderBy("doc_id", "chunk_idx")
          .as[(Long, Long, String, Long)].collect().toSeq
        for ((id, text) <- docs) {
          val chunks = out.filter(_._1 == id)
          assert(chunks.map(_._2) == (0L until chunks.length),
            s"case $i avg=$avg portable=$portable doc $id: non-dense indices")
          assert(chunks.map(_._3).mkString(" ") == text,
            s"case $i avg=$avg portable=$portable doc $id: reassembly mismatch")
          assert(chunks.map(_._4).sum == text.split(" ", -1).length,
            s"case $i avg=$avg portable=$portable doc $id: token counts")
        }
      }
    }
  }

  test("CDC locality: random prefix edits never disturb chunks past the first boundary") {
    (0 until 12).foreach { i =>
      val docs = docsGen(Gen.Parameters.default, Seed(1000L + i)).get
      val df = docs.toDF("doc_id", "text")
      val base = TextAnalysis.contentDefinedChunks(df, "doc_id", "text")
        .orderBy("doc_id", "chunk_idx").as[(Long, Long, String, Long)].collect()
      val edited = docs.map { case (id, t) => (id, s"EDIT$id $t") }.toDF("doc_id", "text")
      val after = TextAnalysis.contentDefinedChunks(edited, "doc_id", "text")
        .orderBy("doc_id", "chunk_idx").as[(Long, Long, String, Long)].collect()
      for ((id, _) <- docs) {
        val tail = base.filter(_._1 == id).map(_._3).drop(1)
        val afterChunks = after.filter(_._1 == id).map(_._3)
        // every original post-first-boundary chunk must appear, in order,
        // as a suffix of the edited doc's chunk list
        assert(afterChunks.takeRight(tail.length).sameElements(tail),
          s"case $i doc $id: post-boundary chunks not stable under prefix edit")
      }
    }
  }

  test("dedupChunks equals a driver-side first-occurrence reference on random corpora") {
    (0 until 8).foreach { i =>
      val docs = docsGen(Gen.Parameters.default, Seed(2000L + i)).get
      val df = docs.toDF("doc_id", "text")
      val chunks = TextAnalysis.contentDefinedChunks(df, "doc_id", "text")
        .as[(Long, Long, String, Long)].collect().toSeq
      val winner = chunks.groupBy(_._3).map { case (_, occ) =>
        occ.minBy(c => (c._1, c._2))
      }.toSet
      val expect = chunks.filter(winner.contains).groupBy(_._1).map { case (id, kept) =>
        val inOrder = kept.sortBy(_._2)
        (id, inOrder.map(_._3).mkString(" "), inOrder.size.toLong)
      }.toSeq.sortBy(_._1)
      val got = Dedup.dedupChunks(df, "doc_id", "text")
        .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
      assert(got == expect, s"case $i: dedupChunks diverges from the reference")
    }
  }
}
