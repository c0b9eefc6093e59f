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
}
