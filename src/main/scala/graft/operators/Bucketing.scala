package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located (bucketed) joins — the shuffle-elimination path for repeated
  * fact-fact joins at 100 TB. Writing both sides bucketed+sorted on the join
  * key lets Spark plan a SortMergeJoin with NO exchange on either side: the
  * bucket files ARE the shuffle output, paid once at write time and amortized
  * over every subsequent join.
  */
object Bucketing {

  /** Write a table bucketed+sorted by the join key into the session catalog
    * (requires a warehouse dir; bucket count sized so a bucket ≈ one task's
    * worth of data at the target scale).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — exchange-free when both
    * sides were written with the same bucket count.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
