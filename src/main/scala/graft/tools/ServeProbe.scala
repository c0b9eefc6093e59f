package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off phase-timing probe for the pruned/stored serving floor:
  * times index OPEN, the probed-cell collect, and the search separately
  * so a wall regression in a pruned serve can be attributed to listing/
  * load overhead vs the scan itself.
  *
  * Usage: runMain graft.tools.ServeProbe <indexDir> <embParquet> [mode]
  *   mode: binary-cells (default) | stored
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val Array(indexDir, embPath) = args.take(2)
    val mode = args.drop(2).headOption.getOrElse("binary-cells")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val vecs = spark.read.parquet(embPath)
    val n = vecs.count()
    val stride = math.max(1L, n / 10)
    val qs = timed("query checkpoint")(
      vecs.filter(col("vec_id") % stride === 0).localCheckpoint())
    // loader sub-steps, replicated for attribution
    timed("  sub: meta read+collect")(
      spark.read.parquet(s"$indexDir/meta").collect())
    timed("  sub: coarse agg")(
      spark.read.parquet(s"$indexDir/coarse")
        .agg(count(lit(1)), min(size(col("centroid")))).collect())
    timed("  sub: pq agg")(
      spark.read.parquet(s"$indexDir/pq")
        .agg(max(col("subspace")), max(col("code"))).collect())
    timed("  sub: codes discovery")(
      spark.read.parquet(s"$indexDir/codes").schema)
    val idx = timed("ivfPqIndexLoad")(Similarity.ivfPqIndexLoad(spark, indexDir))
    timed("serve (all-in)") {
      mode match {
        case "stored" =>
          Similarity.ivfPqSearchStored(idx, qs, "vec_id", "embedding",
            k = 10, nProbe = 8, rerank = 20).count()
        case _ =>
          Similarity.binarySearchCells(idx, vecs, qs, "vec_id", "embedding",
            k = 10, nProbe = 8, rerank = 20).count()
      }
    }
    // second serve over the ALREADY-open index: the amortized shape
    timed("serve (warm, index open)") {
      mode match {
        case "stored" =>
          Similarity.ivfPqSearchStored(idx, qs, "vec_id", "embedding",
            k = 10, nProbe = 8, rerank = 20).count()
        case _ =>
          Similarity.binarySearchCells(idx, vecs, qs, "vec_id", "embedding",
            k = 10, nProbe = 8, rerank = 20).count()
      }
    }
    spark.stop()
  }
}
