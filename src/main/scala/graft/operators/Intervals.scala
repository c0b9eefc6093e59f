package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval joins, Spark-first. A point-in-interval (or interval-overlap)
  * join written naively is a non-equi condition — Spark plans it as a
  * broadcast nested-loop or cartesian product, which dies at scale. The
  * scalable shape BUCKETIZES time: intervals explode to the fixed-width
  * buckets they cover, points map to their single bucket, and the join
  * becomes a plain hash equi-join on (key, bucket) with the exact
  * predicate re-checked after — candidates are only same-bucket pairs,
  * and the explode factor is `interval span / bucketWidth` (pick a width
  * near the typical span: ~1-2 buckets per interval).
  *
  * This is the standard range-join optimization (bucketed range join) —
  * expressed with public Spark operators, no custom strategy needed.
  */
object Intervals {

  private def usBucket(c: Column, widthUs: Long): Column =
    floor(unix_micros(c) / widthUs)

  /** Join `points` (timestamp `ptCol`) to every row of `intervals` whose
    * `[startCol, endCol]` contains it, co-keyed on `keyCol`. Both inputs
    * keep all their columns (name-collisions aside); the pair space never
    * exceeds same-(key, bucket) candidates.
    *
    * `bucketSeconds` tunes the explode factor: each interval appears in
    * `span/bucket + 1` buckets. Intervals are assumed bounded (enforce
    * upstream); an unbounded interval would explode without limit.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
                      ptCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val w = bucketSeconds * 1000000L
    val p = points.withColumn("__bucket", usBucket(col(ptCol), w))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(usBucket(col(startCol), w), usBucket(col(endCol), w))))
    p.join(iv, Seq(keyCol, "__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
