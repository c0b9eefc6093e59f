package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.engine.Schemas

/** Multi-format round-trips (S3/S4/S9). */
class IOSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-io-").toString
  private lazy val df = Seq(("CVE-A", 0.1, 0.5), ("CVE-B", 0.2, 0.6))
    .toDF("cve", "epss", "percentile")

  for (fmt <- Seq("csv", "jsonl", "parquet", "orc")) {
    test(s"$fmt round-trip preserves rows") {
      val path = s"$tmp/rt.$fmt"
      IO.write(df, path, Some(fmt))
      val back = IO.read(spark, path, Some(fmt),
        schema = if (fmt == "parquet" || fmt == "orc") None else Some(Schemas.csvSchema))
      assert(back.select("cve", "epss", "percentile").as[(String, Double, Double)]
        .collect().toSet == df.as[(String, Double, Double)].collect().toSet)
    }
  }

  test("convert re-encodes a directory (S9)") {
    val in = s"$tmp/in.csv"
    val out = s"$tmp/out.parquet"
    IO.write(df, in, Some("csv"))
    IO.convert(spark, in, out, "csv", "parquet", Some(Schemas.csvSchema))
    assert(IO.read(spark, out, Some("parquet")).count() == 2)
  }

  test("readLenient splits clean rows from corrupt lines in one jsonl read") {
    import org.apache.spark.sql.types._
    val path = s"$tmp/feed.jsonl"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), java.util.Arrays.asList(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2 "name": "missing comma"}""",
      """not json at all""",
      """{"id": 3, "name": "fine"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (good, bad) = IO.readLenient(spark, path, schema)
    import spark.implicits._
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "ok"), (3L, "fine")))
    val badLines = bad.as[String].collect().toSet
    assert(badLines.size == 2)
    assert(badLines.exists(_.contains("missing comma")))
    assert(badLines.contains("not json at all"))
    intercept[IllegalArgumentException](
      IO.readLenient(spark, path, schema, format = "parquet"))

    // csv arm (headerless contract): a non-numeric id quarantines the line
    val cpath = s"$tmp/feed.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(cpath), java.util.Arrays.asList(
      "1,ok", "oops,bad id", "3,fine"))
    val (cgood, cbad) = IO.readLenient(spark, cpath, schema, format = "csv")
    assert(cgood.as[(Long, String)].collect().toSet ==
      Set((1L, "ok"), (3L, "fine")))
    assert(cbad.as[String].collect().toSeq == Seq("oops,bad id"))
  }
}
