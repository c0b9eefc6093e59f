package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    val h = spark.sql("SELECT simhash64(split('the quick brown fox', ' ')) AS h")
      .as[Long].head()
    val viaCol = Seq("the quick brown fox").toDF("t")
      .select(SimHash64Expr.simhash64(org.apache.spark.sql.functions.split($"t", " ")))
      .as[Long].head()
    assert(h == viaCol)

    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").as[Double].head()
    assert(d == 11.0)
  }
}
