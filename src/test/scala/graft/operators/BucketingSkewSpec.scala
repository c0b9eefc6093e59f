package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSkewSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans no shuffle exchange") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 4)
    val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"bucketed join should be exchange-free:\n$plan")
    // and it is still correct
    assert(joined.count() ==
      li.join(o, "l_orderkey").count())
  }

  test("salted aggregation equals plain aggregation") {
    val ev = Seq.tabulate(1000)(i => (i % 3, i.toLong)).toDF("k", "v")
    val plain = ev.groupBy("k").agg(sum("v").as("sum_value"), count(lit(1)).as("n_rows"))
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    val salted = Skew.saltedSumCount(ev, "k", "v", salts = 8)
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("generic saltedAgg merges partials correctly") {
    val ev = Seq.tabulate(100)(i => (i % 2, i.toDouble)).toDF("k", "v")
    val out = Skew.saltedAgg(ev, "k", 4,
      partial = Seq("pmin" -> min(col("v")), "pmax" -> max(col("v"))),
      merge = Seq("min_v" -> min(col("pmin")), "max_v" -> max(col("pmax"))))
      .orderBy("k").as[(Int, Double, Double)].collect().toSeq
    assert(out == Seq((0, 0.0, 98.0), (1, 1.0, 99.0)))
  }
}
