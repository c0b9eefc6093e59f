package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property check for the PPJoin prefix filter: [[Dedup.jaccardJoinExact]]
  * claims PERFECT recall (every pair at/above the threshold survives the
  * prefix pruning), which a fixed fixture can't convincingly pin — random
  * corpora hit the edge cases (ties in the rarest-first order, prefix
  * length 1, equal sets, singleton shingle sets, thresholds at 1000).
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Small random corpora over a 6-word vocabulary: short docs make
    * shingle-set overlaps dense, so both sides of the integer gate and
    * the prefix boundary get exercised.
    */
  private val corpusGen: Gen[(List[(Long, String)], Int)] = for {
    nDocs <- Gen.choose(2, 12)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(2, 8)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield ws.mkString(" "))
    p <- Gen.oneOf(300, 500, 700, 900, 1000)
  } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, p)

  private def samples(n: Int): Seq[(List[(Long, String)], Int)] =
    (0 until n).flatMap(i => corpusGen(Gen.Parameters.default, Seed(i.toLong)))

  private def bigramSet(t: String): Set[String] =
    t.split(" ").sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet

  test("jaccardJoinExact equals brute force on random corpora (perfect recall)") {
    samples(25).foreach { case (docs, p) =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.jaccardJoinExact(df, "doc_id", "text", p)
        .select("doc_a", "doc_b", "n_inter").as[(Long, Long, Long)]
        .collect().toSet
      val sets = docs.map { case (id, t) => id -> bigramSet(t) }
        .filter(_._2.nonEmpty)
      val expect = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        if inter * 1000 >= p * (sa.size + sb.size - inter)
      } yield (a, b, inter.toLong)).toSet
      assert(got == expect,
        s"p=$p docs=$docs\n got=$got\n expect=$expect")
    }
  }
}
