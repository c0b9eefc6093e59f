package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox"),
    (1L, "the quick brown fox"),
    (2L, "the quick brown cat"),
    (3L, "utterly unrelated words here")
  ).toDF("doc_id", "text")

  private def viaPlan(): Map[Long, Long] =
    docs.select($"doc_id", SimHash64Expr.simhash64(split($"text", " ")).as("h"))
      .as[(Long, Long)].collect().toMap

  test("identical token arrays hash identically; near texts are close in Hamming") {
    val h = viaPlan()
    assert(h(0L) == h(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(2L)) < ham(h(0L), h(3L)))
  }

  test("codegen path agrees with direct kernel eval") {
    val direct = SimHash64Expr.simhashKernel(ArrayData.toArrayData(
      Array("the", "quick", "brown", "fox").map(UTF8String.fromString)))
    assert(viaPlan()(0L) == direct)
  }

  test("generated code actually compiles: CODEGEN_ONLY factory mode") {
    // With fallback disabled, a Janino compile failure (e.g. the static
    // forwarder for the kernel not being emitted) throws instead of
    // silently degrading to interpreted execution.
    withSQLConf(
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false") {
      assert(viaPlan()(0L) == viaPlan()(1L))
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hamming column helper matches Long.bitCount") {
    val h = viaPlan()
    val d = docs.as("a").crossJoin(docs.as("b"))
      .filter($"a.doc_id" === 0 && $"b.doc_id" === 3)
      .select(SimHash64Expr.hamming(
        SimHash64Expr.simhash64(split($"a.text", " ")),
        SimHash64Expr.simhash64(split($"b.text", " "))).as("d"))
      .as[Int].head()
    assert(d == java.lang.Long.bitCount(h(0L) ^ h(3L)))
  }
}
