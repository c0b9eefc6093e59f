package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property check: the bucketed two-pass selection is bit-equal to the
  * global cumulative-window formulation on RANDOM corpora — heavy score
  * ties, zero costs, tiny/huge budgets, degenerate bucket counts. The
  * fixed cases in SelectionSpec pin known edges; this sweeps the space.
  */
class SelectionPropertySpec extends SparkSpec {
  import spark.implicits._

  private val caseGen: Gen[(Seq[(Long, Double, Long)], Long, Int)] = for {
    n <- Gen.choose(1, 120)
    nScores <- Gen.choose(1, 6) // few distinct scores => heavy ties
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0, nScores - 1)
      c <- Gen.choose(0L, 20L) // includes zero costs
    } yield (s.toDouble / 2, c))
    budget <- Gen.choose(0L, 800L)
    buckets <- Gen.oneOf(1, 2, 13)
  } yield (rows.zipWithIndex.map { case ((s, c), i) => (i.toLong, s, c) },
    budget, buckets)

  test("bucketed selection == global window on 25 random corpora") {
    (0 until 25).foreach { i =>
      val (rows, budget, buckets) =
        caseGen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = rows.toDF("id", "score", "cost")
      val expect = df.withColumn("__run",
          sum(col("cost")).over(Window.orderBy(col("score").desc, col("id"))))
        .filter(col("__run") <= budget)
        .select("id").as[Long].collect().toSet
      val got = Selection.selectUnderBudget(df, "id", "score", "cost",
        budget, buckets).select("id").as[Long].collect().toSet
      assert(got == expect,
        s"case $i: budget=$budget buckets=$buckets rows=${rows.size}")
    }
  }
}
