package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the dedup family's bench tail: times each stage of
  * the q23/q58 pipelines separately at the bench's sf, so optimization work
  * targets measured cost, not guessed cost. Not part of the driver contract.
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // drop every persisted/localCheckpointed RDD the timed body leaked —
    // without this, checkpoint blocks accumulate across invocations and
    // skew every later timing (measured: the whole tail ~80% slower by
    // the time q58 ran)
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def time(name: String)(f: => Long): Unit = {
      f; cleanup() // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      }
      println(f"[profile] $name%-28s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    time("read_only") { docs.count() }
    time("shingle_sets") {
      Dedup.shingleSets(docs, "doc_id", "text").agg(sum(size(col("__set")))).count()
    }
    time("minhash_sigs") {
      Dedup.minhashSignatures(docs, "doc_id", "text").agg(sum(col("mh_0"))).count()
    }
    time("lsh_bands") {
      Dedup.lshBands(Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .count()
    }
    time("lsh_candidates") {
      Dedup.lshCandidates(docs, "doc_id", "text").count()
    }
    time("q23_nearDups") {
      Dedup.nearDups(docs, "doc_id", "text", 0.1).count()
    }
    // A/B twin: the pre-round-6 LAZY formulation (shingle kernel recomputed
    // on the signature pipeline and both verify-join sides)
    time("q23_lazy_sets") {
      val sets = Dedup.shingleSets(docs, "doc_id", "text")
      val sigs = {
        val withSig = sets.withColumn("__sig",
          graft.functions.MinHashKernel.minhashSigs(col("__set"), 8))
        val sigCols = (0 until 8).map(s => element_at(col("__sig"), s + 1).as(s"mh_$s"))
        withSig.select(col("doc_id") +: sigCols: _*)
      }
      val cands = Dedup.lshCandidatesFromSigs(sigs, "doc_id")
      val a = sets.select(col("doc_id").as("doc_a"), col("__set").as("__sa"),
        size(col("__set")).cast("long").as("sz_a"))
      val b = sets.select(col("doc_id").as("doc_b"), col("__set").as("__sb"),
        size(col("__set")).cast("long").as("sz_b"))
      cands.join(a, "doc_a").join(b, "doc_b")
        .withColumn("n_inter",
          graft.functions.MinHashKernel.sortedIntersectCount(col("__sa"), col("__sb")))
        .filter(col("n_inter") > 0)
        .withColumn("jaccard",
          col("n_inter") / (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
        .filter(col("jaccard") >= 0.1).count()
    }
    // experiment: nearDups with the shingle-set table materialized once
    // (localCheckpoint) instead of recomputed on each verify join side
    time("q23_persist_sets") {
      val sets = Dedup.shingleSets(docs, "doc_id", "text").localCheckpoint()
      val sigs = {
        val withSig = sets.withColumn("__sig",
          graft.functions.MinHashKernel.minhashSigs(col("__set"), 8))
        val sigCols = (0 until 8).map(s => element_at(col("__sig"), s + 1).as(s"mh_$s"))
        withSig.select(col("doc_id") +: sigCols: _*)
      }
      val cands = Dedup.lshCandidatesFromSigs(sigs, "doc_id")
      val a = sets.select(col("doc_id").as("doc_a"), col("__set").as("__sa"),
        size(col("__set")).cast("long").as("sz_a"))
      val b = sets.select(col("doc_id").as("doc_b"), col("__set").as("__sb"),
        size(col("__set")).cast("long").as("sz_b"))
      val n = cands.join(a, "doc_a").join(b, "doc_b")
        .withColumn("n_inter",
          graft.functions.MinHashKernel.sortedIntersectCount(col("__sa"), col("__sb")))
        .filter(col("n_inter") > 0)
        .withColumn("jaccard",
          col("n_inter") / (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
        .filter(col("jaccard") >= 0.1).count()
      sets.unpersist()
      n
    }
    time("q58_dedupCorpus") {
      Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.1).count()
    }
    time("q67_dropAgainst") {
      Dedup.dropDuplicatesAgainst(
        docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", minJaccard = 0.1).count()
    }
    spark.stop()
  }
}
