package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, Seq("a b", "b c", "c d")),
    (1L, Seq("a b", "b c", "c d")),
    (2L, Seq("x y", "y z")),
    (3L, Seq[String]())
  ).toDF("doc_id", "set")

  test("minhash_sigs matches the conv(substring(md5)) SQL formulation bit-for-bit") {
    val viaKernel = docs.filter(size($"set") > 0)
      .select($"doc_id", MinHashKernel.minhashSigs($"set", 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaSql = docs.filter(size($"set") > 0)
      .withColumn("__ts", transform($"set",
        x => conv(substring(md5(x), 1, 15), 16, 10).cast("long") % MinHashKernel.P))
      .select($"doc_id", array((0 until 8).map { s =>
        array_min(transform($"__ts", t => (lit(MinHashKernel.A(s)) * t + lit(MinHashKernel.B(s))) % MinHashKernel.P))
      }: _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel == viaSql)
    assert(viaKernel(0L) == viaKernel(1L))
    assert(viaKernel(0L) != viaKernel(2L))
  }

  test("empty shingle array yields null signature") {
    val r = docs.filter($"doc_id" === 3L)
      .select(MinHashKernel.minhashSigs($"set", 8)).head()
    assert(r.isNullAt(0))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted sets") {
    val pairs = docs.filter(size($"set") > 0).as("a")
      .crossJoin(docs.filter(size($"set") > 0).as("b"))
      .select(
        MinHashKernel.sortedIntersectCount(
          sort_array($"a.set"), sort_array($"b.set")).as("merge_n"),
        size(array_intersect($"a.set", $"b.set")).cast("long").as("hash_n"))
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (m, h) => m == h })
  }

  test("shingle_sorted_set matches sort_array(array_distinct(zip_with-chain)) incl. whitespace edges") {
    val texts = Seq(
      "the quick brown fox", "a b", "a  b", " leading", "trailing ",
      "dup dup dup dup", "single", "", "x  ", "über ασδ 中文 中文 tokens"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val viaKernel = texts
        .select($"id", MinHashKernel.shingleSortedSetCol($"text", n).as("s"))
        .filter($"s".isNotNull)
        .as[(Long, Seq[String])].collect().toMap
      val toks = split($"text", " ")
      val m = size(toks) - lit(n - 1)
      val grams = (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, o) =>
        zip_with(acc, slice(toks, lit(o), m), (a, b) => concat_ws(" ", a, b))
      }
      val viaSql = texts.filter(size(toks) >= n)
        .select($"id", sort_array(array_distinct(grams)).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      assert(viaKernel == viaSql, s"n=$n")
    }
  }

  test("kernels survive CODEGEN_ONLY factory mode") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val n = docs.filter(size($"set") > 0)
        .select(MinHashKernel.minhashSigs($"set", 8).as("sig"),
          MinHashKernel.sortedIntersectCount(sort_array($"set"), sort_array($"set")).as("c"))
        .collect()
      assert(n.length == 3)
      val t = Seq((1L, "a b c d")).toDF("id", "text")
        .select(MinHashKernel.shingleSortedSetCol($"text", 2).as("s"),
          MinHashKernel.md5SimHash60Col(split($"text", " ")).as("sh"))
        .collect()
      assert(t.length == 1 && !t.head.isNullAt(0) && !t.head.isNullAt(1))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
