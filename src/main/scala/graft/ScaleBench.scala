package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Changes

/** Baseline-scale self-check: synthesize an EPSS-shaped dense matrix at the
  * reference's published workload size (NOTES.md:38 — 68.9M rows: ~300k
  * CVEs × 230 days, ~0.8% daily change rate ⇒ ~556k changed rows), write it
  * to parquet, then time scan → window-diff → count, the same span the
  * reference times at ~10 s on an M1 Pro (incl. load).
  *
  * Usage: runMain graft.ScaleBench [nCves] [nDays] [workDir]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val nCves = args.headOption.map(_.toInt).getOrElse(300000)
    val nDays = args.drop(1).headOption.map(_.toInt).getOrElse(230)
    val work = args.drop(2).headOption.getOrElse("/tmp/graft-scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // more shuffle partitions than cores shrinks each window sort run
    // (better cache locality + earlier spill-free finish); AQE coalesces
    // them back if they come out too small
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // dense matrix: score changes only when hash(cve, day) falls under the
    // change rate; epss = deterministic function of (cve, last-change day)
    val dense = spark.range(nCves.toLong * nDays)
      .select(
        (col("id") % nDays).as("day"),
        (col("id") / nDays).cast("long").as("cveNum"))
      .select(
        date_add(lit(java.sql.Date.valueOf("2023-03-07")), col("day").cast("int")).as("date"),
        concat(lit("CVE-2023-"), col("cveNum")).as("cve"),
        // piecewise-constant score: changes at pseudo-random days (~0.8%/day)
        (pmod(xxhash64(col("cveNum"),
          floor(col("day") / (lit(1) + pmod(xxhash64(col("cveNum")), lit(250))))), lit(100000L))
          / lit(100000.0)).as("epss"))
      .withColumn("percentile", col("epss"))

    val path = s"$work/dense.parquet"
    dense.write.mode(SaveMode.Overwrite).parquet(path)
    val rows = spark.read.parquet(path).count()

    val t0 = System.nanoTime()
    val changed = Changes.changedRows(
      spark.read.parquet(path), "cve", Seq("date"), "epss").count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"scale_quantize","dense_rows":$rows,"changed_rows":$changed,"value":$secs%.2f,"unit":"sec","rows_per_sec":${(rows / secs).toLong}}""")

    // ── bucketed layout: the window's hash distribution on `cve` is
    // satisfied by the bucketing, so quantization runs with NO exchange —
    // the shuffle is paid once at write time and amortized over every
    // subsequent range query (the 100 TB store design).
    val nBuckets = cpus.toInt
    spark.sql("DROP TABLE IF EXISTS dense_bucketed")
    // the catalog is in-memory per run but the warehouse dir persists —
    // a leftover location from a previous run would fail saveAsTable with
    // LOCATION_ALREADY_EXISTS even after the (no-op) DROP above
    val loc = new org.apache.hadoop.fs.Path(s"$work/warehouse/dense_bucketed")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.read.parquet(path)
      .repartition(nBuckets, col("cve"))            // one file per bucket
      .write.bucketBy(nBuckets, "cve").sortBy("cve", "date")
      .mode(SaveMode.Overwrite).saveAsTable("dense_bucketed")
    val t1 = System.nanoTime()
    val changedB = Changes.changedRows(
      spark.table("dense_bucketed"), "cve", Seq("date"), "epss").count()
    val secsB = (System.nanoTime() - t1) / 1e9
    require(changedB == changed, s"bucketed path disagrees: $changedB vs $changed")
    println(f"""{"metric":"scale_quantize_bucketed","dense_rows":$rows,"changed_rows":$changedB,"value":$secsB%.2f,"unit":"sec","rows_per_sec":${(rows / secsB).toLong}}""")
    spark.stop()
  }
}
