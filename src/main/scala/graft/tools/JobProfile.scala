package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiling main (guide §1/§7 stand-in for the Spark UI, which the
  * sandbox cannot browse): for each named SparkEntry query, one untimed
  * warmup then a timed run under a SparkListener that records every job's
  * wall time, stage count and task count. Driver "dead air" — time between
  * jobs (planning, collects' deserialization, driver loops) — is the
  * difference between the query wall and the sum of job walls, printed per
  * query. Usage:
  *   runMain graft.tools.JobProfile q278,q283 [sfDir] [cpus]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = (if (args.nonEmpty) args(0) else "q278").split(",").map(_.trim)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    // mirror Bench.scala's session config (same env knobs, same local
    // defaults) so a profile reproduces the conditions the driver times —
    // r16's profiles ran at Spark's stock 64m advisory and could not
    // reproduce the bench's small-shuffle coalescing behavior
    val advisory = sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "1m")
    val minPart = sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "64k")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", minPart)
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
                      var stages: Int = 0, var tasks: Int = 0,
                      var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val r = JobRec(j.jobId, start = j.time)
        r.stages = j.stageInfos.size
        r.tasks = j.stageInfos.map(_.numTasks).sum
        r.desc = Option(j.properties).flatMap { p =>
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))
        }.getOrElse("")
        jobs.synchronized { jobs(j.jobId) = r }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(j.jobId).foreach(_.end = j.time) }
    }

    val resolved = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(k => names.exists(k.startsWith))
    resolved.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup: codegen + JIT + listing caches
      jobs.synchronized { jobs.clear() }
      spark.sparkContext.addSparkListener(listener)
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async: drain (poll for missing end times)
      // BEFORE removing the listener — removal first would drop an
      // in-flight SparkListenerJobEnd and the job would print a negative
      // duration (end=0), corrupting jobWallSum/driverGap
      val deadline = System.nanoTime() + 3_000_000_000L
      while (System.nanoTime() < deadline &&
        jobs.synchronized { jobs.values.exists(_.end == 0L) })
        Thread.sleep(50)
      spark.sparkContext.removeSparkListener(listener)
      // a job that still has no end time after the drain is excluded
      // from the sums (and flagged) rather than summed as negative
      val snap = jobs.synchronized { jobs.values.toSeq }
      val unended = snap.count(_.end == 0L)
      if (unended > 0) println(s"   [jobprofile] $unended job(s) never delivered an end event; excluded from sums")
      val jobSum = snap.filter(_.end != 0L).map(r => (r.end - r.start) / 1e3).sum
      println(f"== $name rows=$n wall=$wall%.3f s  jobs=${snap.size} " +
        f"jobWallSum=$jobSum%.3f s  driverGap=${wall - jobSum}%.3f s")
      snap.sortBy(r => -(r.end - r.start)).take(30).foreach { r =>
        println(f"   job ${r.id}%4d ${(r.end - r.start) / 1e3}%7.3f s  " +
          f"stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.desc.take(70)}")
      }
    }
    spark.stop()
  }
}
