package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property parity: the fused dedup kernels must agree with the
  * declarative Spark-SQL formulations their DuckDB oracles state, on
  * RANDOM text — including pathological whitespace, unicode, and
  * repetition (raw ScalaCheck generators, deterministic seeds).
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.oneOf("a", "bb", "über", "中文", "x1", ""),
    Gen.const("dup"))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
    lead <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ", "  ")
  } yield lead + ws.mkString(" ") + trail

  private def sampleTexts(count: Int): Seq[String] =
    (0 until count).flatMap(i => textGen(Gen.Parameters.default, Seed(i.toLong)))

  test("shingle_sorted_set and minhash_sigs agree with the declarative formulations on random text") {
    val texts = sampleTexts(120).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val n = 2
    val toks = split($"text", " ")
    val m = size(toks) - lit(n - 1)
    val grams = (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, o) =>
      zip_with(acc, slice(toks, lit(o), m), (a, b) => concat_ws(" ", a, b))
    }
    val declarative = texts.filter(size(toks) >= n)
      .withColumn("set", sort_array(array_distinct(grams)))
      .withColumn("ts", transform($"set",
        x => conv(substring(md5(x), 1, 15), 16, 10).cast("long") % MinHashKernel.P))
      .select($"id", $"set", array((0 until 8).map { s =>
        array_min(transform($"ts", t => (lit(MinHashKernel.A(s)) * t + lit(MinHashKernel.B(s))) % MinHashKernel.P))
      }: _*).as("sig"))
      .as[(Long, Seq[String], Seq[Long])].collect()
      .map { case (id, set, sig) => id -> ((set, sig)) }.toMap

    val viaKernel = texts
      .select($"id", MinHashKernel.shingleSortedSetCol($"text", n).as("set"))
      .filter($"set".isNotNull)
      .withColumn("sig", MinHashKernel.minhashSigs($"set", 8))
      .as[(Long, Seq[String], Seq[Long])].collect()
      .map { case (id, set, sig) => id -> ((set, sig)) }.toMap

    assert(viaKernel.keySet == declarative.keySet)
    viaKernel.foreach { case (id, (set, sig)) =>
      assert((set, sig) == declarative(id), s"id=$id text=${sampleTexts(120)(id.toInt)}")
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on random sorted sets") {
    val texts = sampleTexts(40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val sets = texts.select($"id", MinHashKernel.shingleSortedSetCol($"text", 2).as("s"))
      .filter($"s".isNotNull)
    val pairs = sets.as("a").crossJoin(sets.as("b"))
      .select(
        MinHashKernel.sortedIntersectCount($"a.s", $"b.s").as("merge_n"),
        size(array_intersect($"a.s", $"b.s")).cast("long").as("hash_n"))
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (a, b) => a == b })
  }
}
