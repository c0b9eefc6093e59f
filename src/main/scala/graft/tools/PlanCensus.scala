package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway plan-census main for the plan audits (not part of the
  * library surface): prints operator counts for a named query's
  * executed plan.
  */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = if (args.nonEmpty) args(0) else "q242_ivf_pq_operating_plan"
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    def cnt(s: String) = plan.split(s, -1).length - 1
    println(s"$name: BroadcastHashJoin=${cnt("BroadcastHashJoin")} " +
      s"SortMergeJoin=${cnt("SortMergeJoin")} " +
      s"CartesianProduct=${cnt("CartesianProduct")} " +
      s"BroadcastNestedLoop=${cnt("BroadcastNestedLoopJoin")} " +
      s"ParquetScans=${cnt("Scan parquet")} " +
      s"CheckpointScans=${cnt("Scan ExistingRDD")} " +
      s"HashAgg=${cnt("HashAggregate")} ObjHashAgg=${cnt("ObjectHashAggregate")} " +
      s"Window=${cnt("Window ")}")
    spark.stop()
  }
}
