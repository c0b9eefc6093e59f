package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pointInInterval matches boundaries inclusively and respects the key") {
    val points = Seq(
      (1L, 100L, ts("2024-01-01 00:10:00")),  // inside
      (1L, 101L, ts("2024-01-01 00:30:00")),  // == end: inclusive
      (1L, 102L, ts("2024-01-01 00:30:01")),  // past end
      (2L, 103L, ts("2024-01-01 00:10:00"))   // other key, same time
    ).toDF("user_id", "pid", "pt")
    val intervals = Seq(
      (1L, 900L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:30:00"))
    ).toDF("user_id", "iid", "lo", "hi")
    val out = Intervals.pointInInterval(points, intervals, "user_id",
      "pt", "lo", "hi", bucketSeconds = 60L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 900L), (101L, 900L)))
  }

  test("pointInInterval equals the naive non-equi join on a dense fixture") {
    // every (user, minute) point vs staggered multi-bucket intervals,
    // bucket width deliberately SMALLER than the spans so candidates
    // cross bucket boundaries — each match must appear exactly once
    // (a point lives in one bucket, so no dedup is ever needed)
    val points = spark.range(200).select(
      (col("id") % 5).as("user_id"), col("id").as("pid"),
      timestamp_micros(col("id") * 60L * 1000000L).as("pt"))
    val intervals = spark.range(40).select(
      (col("id") % 5).as("user_id"), col("id").as("iid"),
      timestamp_micros(col("id") * 300L * 1000000L).as("lo"),
      timestamp_micros((col("id") * 300L + 900L) * 1000000L).as("hi"))
    val bucketed = Intervals.pointInInterval(points, intervals, "user_id",
      "pt", "lo", "hi", bucketSeconds = 120L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    val naive = points.join(intervals, "user_id")
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(bucketed.sorted == naive.sorted)
    assert(bucketed.size == bucketed.toSet.size, "no duplicate pairs")
    assert(bucketed.nonEmpty)
    intercept[IllegalArgumentException](
      Intervals.pointInInterval(points, intervals, "user_id", "pt", "lo", "hi", 0L))
  }
}
