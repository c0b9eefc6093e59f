package graft.streaming

import java.nio.file.Files
import java.sql.Date

import graft.SparkSpec
import graft.engine.{Changes, Score}

/** Streaming quantization produces the same change log as the batch
  * flagship, with state carried across micro-batches.
  */
class ScoreStreamSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("stateful streaming change detection matches batch semantics across batches") {
    val dir = s"${Files.createTempDirectory("graft-scorestream-")}/snaps"
    // one file per snapshot day → one micro-batch per day (maxFilesPerTrigger=1)
    val day1 = Seq(Score(d("2024-01-01"), "CVE-A", 0.10, 0.5),
      Score(d("2024-01-01"), "CVE-B", 0.30, 0.7))
    val day2 = Seq(Score(d("2024-01-02"), "CVE-A", 0.20, 0.6),
      Score(d("2024-01-02"), "CVE-B", 0.30, 0.7))
    val day3 = Seq(Score(d("2024-01-03"), "CVE-A", 0.20, 0.6),
      Score(d("2024-01-03"), "CVE-B", 0.35, 0.8))
    day1.toDS().coalesce(1).write.parquet(s"$dir/d1")
    day2.toDS().coalesce(1).write.parquet(s"$dir/d2")
    day3.toDS().coalesce(1).write.parquet(s"$dir/d3")

    val q = ScoreStream.changedScoresStream(
      ScoreStream.fromDirectory(spark, s"$dir/*"))
      .writeStream.outputMode("append").format("memory").queryName("score_changes")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("score_changes").as[Score].collect()
        .map(r => (r.date.toString, r.cve, r.epss)).sorted.toSeq

      val batch = Changes.changedRows(
        (day1 ++ day2 ++ day3).toDF(), "cve", Seq("date"), "epss")
        .as[Score].collect()
        .map(r => (r.date.toString, r.cve, r.epss)).sorted.toSeq

      assert(streamed == batch)
      assert(streamed == Seq(
        ("2024-01-02", "CVE-A", 0.20),
        ("2024-01-03", "CVE-B", 0.35)))
    } finally q.stop()
  }

  test("appendToStore lands micro-batches as idempotent date partitions") {
    val base = Files.createTempDirectory("graft-storesink-").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")
    val day1 = Seq(Score(d("2024-02-01"), "CVE-A", 0.10, 0.5))
    val day2 = Seq(Score(d("2024-02-02"), "CVE-A", 0.20, 0.6))
    day1.toDS().coalesce(1).write.parquet(s"$src/d1")
    day2.toDS().coalesce(1).write.parquet(s"$src/d2")
    val q = ScoreStream.appendToStore(
      ScoreStream.fromDirectory(spark, s"$src/*"), store, ckpt)
    try q.processAllAvailable() finally q.stop()
    // Hive layout with one partition per date, readable through the store API
    val back = graft.sources.ScoreStore.read(spark, store,
      d("2024-02-01").toLocalDate, d("2024-02-02").toLocalDate)
      .as[Score].collect().map(r => (r.date.toString, r.cve, r.epss)).sorted.toSeq
    assert(back == Seq(("2024-02-01", "CVE-A", 0.10), ("2024-02-02", "CVE-A", 0.20)))
    // replaying one day's data through the batch writer is idempotent
    graft.sources.ScoreStore.write(day2.toDF(), store)
    assert(graft.sources.ScoreStore.read(spark, store,
      d("2024-02-01").toLocalDate, d("2024-02-02").toLocalDate).count() == 2)
  }

  test("late/backfilled snapshots are dropped, not folded out of order") {
    val dir = s"${Files.createTempDirectory("graft-scorestream-late-")}/snaps"
    // day-3 file lands BEFORE day-2's backfill
    Seq(Score(d("2024-01-01"), "CVE-A", 0.10, 0.5)).toDS()
      .coalesce(1).write.parquet(s"$dir/a_d1")
    Seq(Score(d("2024-01-03"), "CVE-A", 0.20, 0.6)).toDS()
      .coalesce(1).write.parquet(s"$dir/b_d3")
    Seq(Score(d("2024-01-02"), "CVE-A", 0.20, 0.6)).toDS()
      .coalesce(1).write.parquet(s"$dir/c_d2_late")

    val q = ScoreStream.changedScoresStream(
      ScoreStream.fromDirectory(spark, s"$dir/*"))
      .writeStream.outputMode("append").format("memory").queryName("late_changes")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("late_changes").as[Score].collect()
        .map(r => (r.date.toString, r.cve, r.epss)).toSeq
      // the late day-2 row must NOT regress state or emit a duplicate
      assert(rows == Seq(("2024-01-03", "CVE-A", 0.20)))
    } finally q.stop()
  }
}
