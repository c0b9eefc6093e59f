package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch diagnostic: occupancy skew of [[Similarity.lshBucket]] at a
  * given plane count over the PipelineScaleBench synthetic embeddings.
  * Usage: runMain graft.tools.BucketHistogram <embParquet> <planes>
  */
object BucketHistogram {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val planes = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(path)
    val occ = vecs.select(Similarity.lshBucket(col("embedding"), planes).as("b"))
      .groupBy("b").count()
    val stats = occ.agg(
      count(lit(1)).as("n_buckets"),
      max("count").as("max_occ"),
      expr("approx_percentile(count, array(0.5, 0.9, 0.99))").as("pct"),
      sum(col("count") * (col("count") - 1) / 2).as("intra_pairs")).head()
    println(s"planes=$planes buckets=${stats.get(0)} max_occ=${stats.get(1)} " +
      s"p50/p90/p99=${stats.get(2)} same_bucket_pairs=${stats.get(3)}")
    spark.stop()
  }
}
