package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the full executed plan of one SparkEntry query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = if (args.nonEmpty) args(0) else "q01_changed_values"
    println(graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
