package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents in a
  * deterministic order and cut the stream into fixed-capacity token bins
  * (the "concat then chunk" model — a document belongs to the bin its
  * first token lands in).
  *
  * Scale design: a single global running sum would serialize on one
  * partition, so the corpus is first sharded by content hash (same md5
  * permille family as [[Sampling]] — deterministic, engine-portable),
  * and the running sum is a window per shard: shards pack in parallel,
  * each emitting its own bin sequence. At 100 TB, `shards` scales with
  * the cluster; within a shard the window sort spills like any other.
  */
object Packing {

  /** Assign each document a (shard, bin_id): shard by id hash, then
    * greedy sequential packing in `idCol` order within the shard —
    * `bin_id = tokens_before_this_doc div capacity`.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int, shards: Int = 64, salt: String = ""): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(shards > 0, s"shards must be positive: $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(Sampling.hashBucket(col(idCol), salt), lit(shards.toLong)))
      .withColumn("n_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("__before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__before div $capacity"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("bin_id"))
  }

  /** Materialized bins: the packed text per (shard, bin) plus its token
    * count — what a tokenizer-side loader would consume. Bins overflow
    * by at most one document's tail (the concat-then-chunk contract).
    */
  def packedBins(df: DataFrame, idCol: String, textCol: String,
                 capacity: Int, shards: Int = 64, salt: String = ""): DataFrame = {
    val assigned = packSequences(df, idCol, textCol, capacity, shards, salt)
      .join(df.select(col(idCol), col(textCol)), idCol)
    assigned.groupBy(col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        concat_ws(" ", array_sort(collect_list(struct(col(idCol), col(textCol))))
          .getField(textCol)).as("packed_text"))
  }
}
