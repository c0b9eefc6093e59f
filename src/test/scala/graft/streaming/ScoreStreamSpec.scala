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

  test("appendToStore survives a date spanning micro-batches and replays idempotently") {
    val base = Files.createTempDirectory("graft-storesink-").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")
    // day 2024-02-01 arrives in TWO files → two micro-batches
    // (maxFilesPerTrigger=1): the naive per-batch partition overwrite
    // would silently drop CVE-A when the CVE-B batch lands
    Seq(Score(d("2024-02-01"), "CVE-A", 0.10, 0.5)).toDS()
      .coalesce(1).write.parquet(s"$src/d1a")
    Seq(Score(d("2024-02-01"), "CVE-B", 0.40, 0.8),
      Score(d("2024-02-02"), "CVE-A", 0.20, 0.6)).toDS()
      .coalesce(1).write.parquet(s"$src/d1b")
    val q = ScoreStream.appendToStore(
      ScoreStream.fromDirectory(spark, s"$src/*"), store, ckpt)
    try q.processAllAvailable() finally q.stop()
    val back = graft.sources.ScoreStore.read(spark, store,
      d("2024-02-01").toLocalDate, d("2024-02-02").toLocalDate)
      .as[Score].collect().map(r => (r.date.toString, r.cve, r.epss)).sorted.toSeq
    assert(back == Seq(
      ("2024-02-01", "CVE-A", 0.10), ("2024-02-01", "CVE-B", 0.40),
      ("2024-02-02", "CVE-A", 0.20)))
    // restarting the stream over the same source replays nothing new and
    // the store is unchanged (checkpoint) — and a manual re-run of one
    // day's batch converges to the same contents
    val q2 = ScoreStream.appendToStore(
      ScoreStream.fromDirectory(spark, s"$src/*"), store, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.sources.ScoreStore.read(spark, store,
      d("2024-02-01").toLocalDate, d("2024-02-02").toLocalDate).count() == 3)
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
