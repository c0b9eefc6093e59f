package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: does an `observe()` metric fire on the job that an EAGER
  * `localCheckpoint()` runs (i.e. is checkpoint a `withAction`)? The
  * Graph.hits mass-on-the-checkpoint-job optimization depends on it; if
  * this probe hangs or throws, the optimization is off the table.
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = new Observation("probe")
    val df = spark.range(100)
      .select(col("id"), (col("id") * 2).as("v"))
      .observe(obs, sum(col("v").cast("decimal(38,12)")).cast("double").as("__mass"))
      .localCheckpoint()
    // bound the wait so a non-firing metric prints a diagnosis instead of
    // hanging the session
    def bounded(o: Observation): Option[Map[String, Any]] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      try Some(Await.result(Future(o.get), 30.seconds))
      catch { case e: Throwable => println(s"observe did not fire: $e"); None }
    }
    println(s"metric=${bounded(obs).map(_.get("__mass"))}")
    println(s"rows=${df.count()}")
    val empty = new Observation("probe2")
    val df2 = spark.range(0)
      .select(col("id").as("v"))
      .observe(empty, sum(col("v").cast("decimal(38,12)")).cast("double").as("__mass"))
      .localCheckpoint()
    println(s"emptyMetric=${bounded(empty).map(_.get("__mass"))}")
    println(s"emptyRows=${df2.count()}")
    spark.stop()
  }
}
