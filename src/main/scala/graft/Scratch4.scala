package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"SCRATCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); t0 = System.nanoTime()
    }
    println("SCRATCH q58 " + Dedup.dedupCorpus(docs, "doc_id", "text", 0.1).count())
    lap("q58_cold")
    println("SCRATCH q58 " + Dedup.dedupCorpus(docs, "doc_id", "text", 0.1).count())
    lap("q58_warm")
    println("SCRATCH q52 " + Dedup.connectedComponents(Dedup.lshCandidates(docs, "doc_id", "text")).count())
    lap("q52_warm")
  }
}
