package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` output for named SparkEntry
  * queries to files — the plans/rNN/<query>_{before,after}.txt artifact
  * the optimization rounds commit. Usage:
  *   runMain graft.tools.ExplainDump <outDir> <suffix> q260,q265,... [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    // sfDir as an optional 4th arg (the JobProfile convention) so the
    // tool is not silently tied to this sandbox's fixture path
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val resolved = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(k => names.exists(k.startsWith))
    resolved.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
