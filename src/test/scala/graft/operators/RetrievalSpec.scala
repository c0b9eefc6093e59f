package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    self.collect(pf) ++ self.subqueries.flatMap(collectAll(_)(pf))
  }

  test("hybridSearch: arm parity, lifecycle transparency, serve-plan pins") {
    val dIdx = Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding",
      nCentroids = 8, subspaces = 4, subDim = 16, pqK = 4, pqIters = 2)
    val sIdx = TextAnalysis.sparseIndexBuild(docs, "doc_id", "text",
      weighting = "tfidf", minDf = 2, cap = Some(10))
    val qv = Sampling.hashSampleN(emb, "vec_id", 8)
    val qp = sIdx.postings
      .join(Sampling.hashSampleN(docs, "doc_id", 8).select("doc_id"), "doc_id")
      .withColumnRenamed("doc_id", "query_id")

    val fusedRows = Retrieval.hybridSearch(dIdx, emb, qv, "vec_id", "embedding",
      sIdx, qp, "query_id", "token", "weight", k = 5, nProbe = 4, rerank = 20)
      .select("query_id", "doc_id", "rank_1", "rank_2", "rrf")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), r.getDouble(4))).toSet
    assert(fusedRows.nonEmpty)

    // arm parity: rank_1 IS the ivfPqSearch ranking, rank_2 IS the
    // capped sparseTopK ranking — the fusion invents no ranks
    val dn = Similarity.ivfPqSearch(dIdx, emb, qv, "vec_id", "embedding",
      k = 5, nProbe = 4, rerank = 20)
      .select(col("query_id"), col("neighbor_id"), col("rn"))
      .as[(Long, Long, Long)].collect().toSet
    val sp = TextAnalysis.sparseTopK(
      TextAnalysis.cappedPostings(sIdx.postings, "doc_id", "token", "weight", 10),
      "doc_id", qp, "query_id", "token", "weight", k = 5)
      .select(col("query_id"), col("doc_id"), col("rn"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fusedRows.filter(_._3.isDefined)
      .map(r => (r._1, r._2, r._3.get.asInstanceOf[Long])) == dn)
    assert(fusedRows.filter(_._4.isDefined)
      .map(r => (r._1, r._2, r._4.get.asInstanceOf[Long])) == sp)

    // lifecycle transparency: serving from SAVED+RELOADED indexes is
    // bit-identical to serving from the in-memory builds
    val base = java.nio.file.Files.createTempDirectory("hybrid").toString
    Similarity.ivfPqIndexSave(dIdx, s"$base/dense")
    TextAnalysis.sparseIndexSave(sIdx, s"$base/sparse")
    val dRe = Similarity.ivfPqIndexLoad(spark, s"$base/dense")
    val sRe = TextAnalysis.sparseIndexLoad(spark, s"$base/sparse")
    val qpRe = sRe.postings
      .join(Sampling.hashSampleN(docs, "doc_id", 8).select("doc_id"), "doc_id")
      .withColumnRenamed("doc_id", "query_id")
    val served = Retrieval.hybridSearch(dRe, emb, qv, "vec_id", "embedding",
      sRe, qpRe, "query_id", "token", "weight", k = 5, nProbe = 4, rerank = 20)
    assert(served.select("query_id", "doc_id", "rank_1", "rank_2", "rrf")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), r.getDouble(4))).toSet == fusedRows)

    // serve-plan pins (the q232 retrain-free rule, composed): no
    // window, no cartesian, the ONLY merge join is the full-outer
    // fusion, and the plan never scans documents.text — no tokenize /
    // weight chain is reachable from a loaded index
    val p = served.queryExecution.executedPlan
    assert(collectAll(p) { case w: WindowExec => w }.isEmpty)
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }.isEmpty)
    val smj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.size <= 1 && smj.forall(_.joinType.sql == "FULL OUTER"),
      s"only the eval-sized fusion full-join may merge, got ${smj.size}")
    val scannedText = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("ReadSchema").exists(_.contains("text")) => f
    }
    assert(scannedText.isEmpty, "serving must not re-read documents.text")
  }
}
