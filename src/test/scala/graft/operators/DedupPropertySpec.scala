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

  /** Random corpora with PLANTED byte-identical copy clusters: the
    * exact-first expansion ([[Dedup.crossSourceOverlap]] /
    * [[Dedup.thresholdSweep]]) must equal the naive census computed from
    * raw-corpus [[Dedup.nearDups]] — the lossless-expansion claim, pinned
    * beyond the single fixture.
    */
  private val copyCorpusGen: Gen[List[(Long, String, String)]] = for {
    nBase <- Gen.choose(2, 8)
    base <- Gen.listOfN(nBase, for {
      len <- Gen.choose(2, 8)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield ws.mkString(" "))
    copies <- Gen.listOfN(nBase, Gen.choose(0, 3))
    srcs <- Gen.listOfN(nBase * 4 + nBase, Gen.oneOf("s1", "s2", "s3"))
  } yield {
    val rows = base.zipWithIndex.flatMap { case (t, i) =>
      (0 to copies(i)).map(c => (i * 10L + c, t))
    }
    rows.zipWithIndex.map { case ((id, t), j) => (id, t, srcs(j % srcs.size)) }
  }

  test("exact-first expansion equals the naive raw-corpus census on random copy clusters") {
    val cases = (0 until 12).flatMap(i =>
      copyCorpusGen(Gen.Parameters.default, Seed(500L + i)))
    cases.foreach { rows =>
      val df = rows.toDF("doc_id", "text", "source")
      val srcOf = rows.map(r => r._1 -> r._3).toMap
      // naive reference: pairs from LSH over the RAW corpus
      val rawPairs = Dedup.nearDups(df.select("doc_id", "text"), "doc_id", "text",
        minJaccard = 0.3)
        .select("doc_a", "doc_b", "n_inter", "sz_a", "sz_b")
        .as[(Long, Long, Long, Long, Long)].collect()
      val expCells = rawPairs
        .groupBy { case (a, b, _, _, _) =>
          val (sa, sb) = (srcOf(a), srcOf(b))
          (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa) }
        .view.mapValues(_.length.toLong).toMap
      val gotCells = Dedup.crossSourceOverlap(df, "doc_id", "text", "source",
        minJaccard = 0.3)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(gotCells == expCells, s"cells on $rows")
      // threshold sweep at floor 0.3, 20 bins
      val expBins = rawPairs
        .groupBy { case (_, _, ni, sa, sb) =>
          math.min(20L * ni / (sa + sb - ni), 19L).toInt }
        .view.mapValues(_.length.toLong).toMap
      val gotBins = Dedup.thresholdSweep(df.select("doc_id", "text"),
        "doc_id", "text", floor = 0.3, bins = 20)
        .as[(Int, Double, Long, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(gotBins == expBins, s"bins on $rows")
    }
  }

  test("clusterSafeSplit never splits a verified duplicate cluster on random copy corpora") {
    val cases = (0 until 8).flatMap(i =>
      copyCorpusGen(Gen.Parameters.default, Seed(900L + i)))
    cases.foreach { rows =>
      val df = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
      val out = Dedup.clusterSafeSplit(df, "doc_id", "text",
        minJaccard = 0.3, testPermille = 400, salt = "pp")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(out.size == rows.size)
      // every doc pair the dedup graph connects must share a split: use
      // the audit's winner_id as the cluster label (same graph code)
      val cluster = Dedup.dedupAudit(df, "doc_id", "text", minJaccard = 0.3)
        .select("doc_id", "winner_id").as[(Long, Long)].collect()
      cluster.groupBy(_._2).values.foreach { members =>
        val splits = members.map { case (id, _) => out(id) }.toSet
        assert(splits.size == 1, s"cluster ${members.map(_._1)} split $splits on $rows")
      }
      // histogram twin over the same graph: sizes must match the audit's
      // winner groups exactly, and Σ sz·n_clusters must conserve the corpus
      val hist = Dedup.clusterSizeHistogram(df, "doc_id", "text", minJaccard = 0.3)
        .as[(Long, Long)].collect().toMap
      val refHist = cluster.groupBy(_._2).values.map(_.size.toLong)
        .groupBy(identity).map { case (sz, g) => sz -> g.size.toLong }
      assert(hist.filter(_._2 != 0) == refHist.filter(_._2 != 0),
        s"histogram on $rows")
      assert(hist.map { case (sz, n) => sz * n }.sum == rows.size.toLong)
    }
  }
}
