package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.engine.Schemas

/** Columnar snapshot store (SURVEY.md §1.4).
  *
  * Layout: Hive-partitioned parquet `root/date=YYYY-MM-DD/part-*.parquet` so
  * Catalyst prunes partitions on date predicates for free — the idiomatic
  * twin of the reference's one-file-per-date naming
  * `{workdir}/{YYYY-MM-DD}.parquet` (client.py:302-314). A flat-file layout
  * reader is kept for compatibility (S5: date inferred from the filename,
  * util.py:242-247).
  */
object ScoreStore {

  private val DatePattern = "(\\d{4}-\\d{2}-\\d{2})"

  /** Read the partitioned store, pruned to [min, max]. The range filter lands
    * on the partition column, so only the needed `date=` directories are
    * listed and scanned (PruneFileSourcePartitions).
    */
  def read(spark: SparkSession, root: String, min: LocalDate, max: LocalDate): DataFrame =
    spark.read.parquet(root)
      .withColumn(Schemas.Date, col(Schemas.Date).cast(DateType))
      .filter(col(Schemas.Date).between(
        lit(java.sql.Date.valueOf(min)), lit(java.sql.Date.valueOf(max))))
      .select(Schemas.scoreColumns.map(col): _*)

  /** Read with the quantization baseline: one extra day before `min` so the
    * first requested day has a diff baseline (intent of client.py:213-214,
    * SURVEY.md §2.13.1).
    */
  def readWithBaseline(spark: SparkSession, root: String, min: LocalDate, max: LocalDate): DataFrame =
    read(spark, root, min.minusDays(1), max)

  /** Write snapshots into the partitioned layout. Dynamic overwrite keeps
    * re-ingest of one day idempotent without clobbering other partitions —
    * the store-level twin of the reference's exists-check skip
    * (client.py:142, 173-175).
    */
  def write(df: DataFrame, root: String): Unit =
    df.write
      .partitionBy(Schemas.Date)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(root)

  /** S1: ingest one upstream snapshot CSV (optionally gzipped — Spark's CSV
    * reader decompresses by extension). Post-2022 feed files carry a one-line
    * `#model_version:...` comment header (client.py:185-188); Spark's
    * `comment` option subsumes the reference's skip_rows logic. The date is
    * stamped from the argument (client.py:478-496).
    */
  def ingestCsv(spark: SparkSession, path: String, date: LocalDate): DataFrame =
    spark.read
      .schema(Schemas.csvSchema)
      .option("header", "true")
      .option("comment", "#")
      .csv(path)
      .withColumn(Schemas.Date, lit(java.sql.Date.valueOf(date)))
      .select(Schemas.scoreColumns.map(col): _*)

  /** S5: flat-file layout — derive `date` from the filename
    * (`epss_scores-YYYY-MM-DD.csv.gz` / `YYYY-MM-DD.parquet`), the Spark twin
    * of util.py:242-247's regex inference.
    */
  def readFlatWithInferredDate(spark: SparkSession, glob: String, format: String = "parquet"): DataFrame = {
    val base = format match {
      case "csv" => spark.read.schema(Schemas.csvSchema)
        .option("header", "true").option("comment", "#").csv(glob)
      case "parquet" => spark.read.parquet(glob)
      case "json" | "jsonl" => spark.read.schema(Schemas.csvSchema).json(glob)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    val withDate =
      if (base.columns.contains(Schemas.Date)) base
      else base.withColumn(Schemas.Date,
        to_date(regexp_extract(input_file_name(), DatePattern, 1)))
    withDate.select(Schemas.scoreColumns.map(col): _*)
  }

  /** 100 TB store layout: date-PARTITIONED and cve-BUCKETED. Date-range
    * predicates prune partitions at the scan; the quantization window's
    * hash-distribution requirement on `cve` is satisfied by the bucketing,
    * so the flagship runs with NO shuffle of the dense data — the exchange
    * is paid once at ingest and amortized over every subsequent query.
    * Bucket count ≈ cluster cores at target scale (power of two).
    */
  def writeBucketedTable(df: DataFrame, table: String, buckets: Int): Unit =
    df.write
      .partitionBy(Schemas.Date)
      .bucketBy(buckets, Schemas.Cve)
      .sortBy(Schemas.Cve)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Pruned scan of the bucketed store (same contract as [[read]]). */
  def readBucketedTable(spark: SparkSession, table: String,
                        min: LocalDate, max: LocalDate): DataFrame =
    spark.table(table)
      .withColumn(Schemas.Date, col(Schemas.Date).cast(DateType))
      .filter(col(Schemas.Date).between(
        lit(java.sql.Date.valueOf(min)), lit(java.sql.Date.valueOf(max))))
      .select(Schemas.scoreColumns.map(col): _*)

  /** S2: bulk idempotent ingest — fan one-day CSV ingests across a date
    * range, skipping dates whose partition already exists (the store-level
    * twin of the reference's exists-check skip, client.py:126-161). The
    * per-file work is Spark-parallel; the loop is driver-side control only.
    */
  def ingestMany(spark: SparkSession, root: String,
                 files: Seq[(LocalDate, String)]): Seq[LocalDate] = {
    // list existing partitions through the Hadoop FileSystem of the store
    // path (NOT java.io.File, which sees nothing on hdfs:// or s3a:// and
    // would silently re-ingest every date, degrading the idempotence
    // contract twin of client.py's exists-check)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done: Set[String] =
      if (fs.exists(rootPath))
        fs.listStatus(rootPath).map(_.getPath.getName)
          .filter(_.startsWith("date=")).map(_.stripPrefix("date=")).toSet
      else Set.empty[String]
    files.filterNot { case (d, _) => done.contains(d.toString) }.map { case (d, path) =>
      write(ingestCsv(spark, path, d), root)
      d
    }
  }

  /** Max date present in the store — the offline twin of the reference's
    * network max-date discovery (client.py:386-402; SURVEY.md §7.6.4).
    * Partition-column-only scan: no data files are read.
    */
  def maxDate(spark: SparkSession, root: String): Option[LocalDate] = {
    val r = spark.read.parquet(root)
      .select(max(col(Schemas.Date).cast(DateType))).head()
    Option(r.getDate(0)).map(_.toLocalDate)
  }
}
