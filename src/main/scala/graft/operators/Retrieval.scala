package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed retrieval SERVING over persisted indexes — the production
  * hybrid-search shape: both retrieval arms open pre-built index
  * relations and the fusion touches only top-k lists. The build verbs
  * ([[Similarity.ivfPqIndexBuild]], [[TextAnalysis.sparseIndexBuild]])
  * run once, offline; this file is the online half.
  */
object Retrieval {

  /** HYBRID dense+sparse top-`k` retrieval from two PERSISTED indexes —
    * the serving verb the inline q252 composition amortizes into: the
    * dense arm is [[Similarity.ivfPqSearch]] over an IVF-PQ index
    * (retrain-free by construction — the only driver work is two
    * bounded codebook collects), the sparse arm is
    * [[TextAnalysis.sparseIndexSearch]] over a [[TextAnalysis
    * .SparseIndex]]'s SERVING relation (the build-time capped prune
    * when the index carries one), and the two rank lists fuse with
    * [[Selection.rrfFuseRanks]] (dense term first, `1/(k0+rank)` at
    * 6 dp). Output `(query_id, doc_id, rank_1, rank_2, rrf)` — rank_1
    * dense, rank_2 sparse, null where an arm missed the doc.
    *
    * Queries arrive in each arm's native shape — `queryVecs` as
    * `(id, vector)` rows for the dense arm, `queryPostings` as
    * `(query_id, term, weight)` rows for the sparse arm (for
    * find-similar-documents, derive them from the sparse index's own
    * UNCAPPED postings — the query's full weight profile, q247's
    * convention) — both bounded by the eval/serving contract.
    *
    * 100 TB shape: NO training or weight-chain job is reachable from
    * here (the [[Similarity.ivfPqSearch]] retrain-free guarantee plus
    * the sparse index's materialized posting relations — PlanSpec pins
    * zero Lloyd barriers and zero tokenize/df scans in the serve plan);
    * the corpus never shuffles in either arm (literal-codebook
    * expressions + broadcast probes on the dense side, broadcast query
    * postings on the sparse side, bounded-heap ranks in both); the
    * fusion full-joins two ≤ queries·k relations — noise against the
    * retrievals.
    */
  def hybridSearch(dense: Similarity.IvfPqIndex, corpus: DataFrame,
                   queryVecs: DataFrame, idCol: String, vecCol: String,
                   sparse: TextAnalysis.SparseIndex,
                   queryPostings: DataFrame, queryIdCol: String,
                   termCol: String, weightCol: String,
                   k: Int, nProbe: Int = 4, rerank: Int = 20,
                   k0: Int = 60): DataFrame = {
    val dn = Similarity.ivfPqSearch(dense, corpus, queryVecs, idCol, vecCol,
      k, nProbe, rerank)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rn"))
    val sp = TextAnalysis.sparseIndexSearch(sparse, queryPostings,
      queryIdCol, termCol, weightCol, k)
      .select(col("query_id"), col("doc_id"), col("rn"))
    Selection.rrfFuseRanks(Seq(dn, sp), "query_id", "doc_id", "rn", k0)
  }
}
