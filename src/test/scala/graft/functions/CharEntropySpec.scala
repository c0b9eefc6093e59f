package graft.functions

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def h(s: String): Double =
    CharEntropyExpr.entropyKernel(UTF8String.fromString(s))

  test("kernel: closed-form entropies") {
    assert(h("") == 0.0)
    assert(h("aaaa") == 0.0)
    assert(h("ab") == 1.0)                       // two equiprobable symbols
    assert(h("abcd") == 2.0)                     // four equiprobable
    assert(math.abs(h("aab") - 0.9182958340544896) < 1e-12) // (2/3,1/3)
    // surrogate pairs count as ONE codepoint: two distinct emoji = 1 bit
    assert(h("😀😁") == 1.0)
  }

  test("expression: null in, null out; plan values match the kernel") {
    val df = Seq((1L, "abab"), (2L, null.asInstanceOf[String]), (3L, "zzzz"))
      .toDF("id", "t")
    val got = df.select($"id",
      CharEntropyExpr.charEntropy($"t").as("e"))
      .orderBy("id").as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq((1L, Some(1.0)), (2L, None), (3L, Some(0.0))))
  }

  test("generated code actually compiles: CODEGEN_ONLY factory mode") {
    withSQLConf(
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false") {
      val out = Seq("abcdabcd").toDF("t")
        .select(CharEntropyExpr.charEntropy($"t")).as[Double].collect()
      assert(out.head == 2.0)
    }
  }

  test("non-string input is a type-check failure") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(CharEntropyExpr.charEntropy($"x")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
