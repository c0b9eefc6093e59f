package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation via salting: two-phase aggregate where phase 1
  * fans each hot key across `salts` shuffle partitions and phase 2 merges
  * the partials. Correct for any algebraic aggregate (sum/count/min/max).
  *
  * At 100 TB, AQE's skew-join splitting handles JOIN skew automatically;
  * groupBy skew on a pathological key distribution still needs salting —
  * this is that primitive.
  */
object Skew {

  /** salted sum+count per key: groupBy(key, salt) partial → groupBy(key)
    * merge. The salt is derived from ROW CONTENT (not
    * monotonically_increasing_id, which changes across task retries and
    * would lose/duplicate rows on shuffle-fetch-failure recomputation — the
    * SPARK-23207 class of hazard): identical input rows always land in the
    * same salt bucket, so retried tasks reproduce the same shuffle output.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(key), col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("sum_value"), sum("__pcnt").as("n_rows"))

  /** Generic salted aggregation: caller supplies partial and merge
    * expressions keyed by output name, e.g.
    * partial = Map("s" -> sum(col("v")), "c" -> count(lit(1)));
    * merge   = Map("sum_v" -> sum(col("s")), "n" -> sum(col("c"))).
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Seq[(String, Column)], merge: Seq[(String, Column)]): DataFrame = {
    val p = partial.map { case (n, c) => c.as(n) }
    val m = merge.map { case (n, c) => c.as(n) }
    // content-derived salt over every input column: deterministic under
    // task retry (see saltedSumCount)
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(p.head, p.tail: _*)
      .groupBy(col(key))
      .agg(m.head, m.tail: _*)
  }
}
