package graft.engine

import org.apache.spark.sql.DataFrame

import graft.sources.IO

/** Result sinks (S4/S6/S7 — cli.py:166-182, util.py:33-52).
  *
  * `table` = console pretty-print (`pl.Config.set_tbl_rows(-1)` means the
  * reference prints ALL rows, cli.py:15-16 — here capped by default; pass
  * n = Int.MaxValue for strict parity on small results). `json` console sink
  * relies on Spark rendering DateType as ISO-8601, which subsumes the
  * reference's custom encoder (json_encoder.py:5-9).
  */
object Outputs {

  def show(df: DataFrame, n: Int = 1000): Unit = df.show(n, truncate = false)

  /** S7: JSONL lines to the console — for small results only (driver-side). */
  def showJsonl(df: DataFrame, n: Int = 1000): Unit =
    df.limit(n).toJSON.collect().foreach(println)

  /** File sinks: csv / json(l) / parquet via the shared IO layer. */
  def write(df: DataFrame, path: String, format: String, singleFile: Boolean = false): Unit =
    IO.write(df, path, Some(format), singleFile)

  /** S4 row-oriented JSON: the reference's `json` format writes one JSON
    * ARRAY (util.py:41-44), not JSONL. Spark writes JSONL per partition, so
    * exact array parity is assembled driver-side (SURVEY §7.6.3) — confined
    * to small results by `maxRows` (fails loudly rather than silently
    * truncating).
    */
  def writeJsonArray(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    val rows = df.limit(maxRows + 1).toJSON.collect()
    require(rows.length <= maxRows,
      s"writeJsonArray is a driver-side sink for small results (> $maxRows rows); " +
        "use format=jsonl for large outputs")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      rows.mkString("[", ",", "]"))
  }

  /** S8 Excel sink — a REAL driver-side xlsx writer, twin of the
    * reference's `df.write_excel` (README.md:285-289;
    * examples/get-excel-workbook-of-changed-epss-scores.py:44-49, which
    * likewise writes a collected small result from the driver). The
    * workbook is authored directly as the minimal OOXML package (zip of
    * five XML parts, inline strings — no shared-string table), so no
    * external spreadsheet library is needed. Numeric/boolean columns
    * become native cell types; everything else (strings, dates,
    * timestamps) is an inline string in its Spark `toString` rendering
    * (dates are ISO-8601, matching the JSON sink). Driver-side by design —
    * like the reference — so `maxRows` bounds it loudly.
    */
  def writeExcel(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    require(path.endsWith(".xlsx"), s"excel sink expects an .xlsx path, got $path")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"writeExcel is a driver-side sink for small results (> $maxRows rows); " +
        "use parquet/csv for large outputs")
    // through the Hadoop FS like every other sink, so hdfs:// / s3a://
    // output paths work the same as local ones; checksum sidecars are
    // disabled so a local write yields report.xlsx, not a stray
    // .report.xlsx.crc next to it (LocalFileSystem is a ChecksumFileSystem).
    // A PRIVATE FileSystem instance takes the setting: FileSystem.get
    // returns the JVM-wide cached instance, and flipping writeChecksum on
    // it would silently disable checksums for every later write through
    // that FileSystem, this sink included among strangers
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(hp.toUri,
      df.sparkSession.sparkContext.hadoopConfiguration)
    try {
      fs.setWriteChecksum(false)
      val out = fs.create(hp, true)
      try Xlsx.write(out, df.schema, rows) finally out.close()
    } finally fs.close()
  }
}
