package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics over document/reference graphs (citation ranking
  * for corpus curation: rank pages by link authority before quality
  * filtering, the web-corpus analogue of the reference's score-ordered
  * exports).
  *
  * Iteration discipline (SCALE.md §iterative fixpoints): open-ended
  * FIXPOINT loops must not stack DataFrame plans — per-round planning
  * cost grows without bound under Catalyst/AQE (measured; see
  * [[Dedup.connectedComponents]] for the RDD fixpoint pattern). PageRank
  * here is the other regime: a FIXED, small, caller-chosen iteration
  * count (5-20 in practice), so the plan depth is bounded by contract
  * and the declarative formulation stays — Catalyst sees the whole
  * unrolled pipeline and AQE sizes each iteration's exchanges.
  */
object Graph {

  /** PageRank with damping `d` over `iters` fixed iterations:
    * `r_{t+1}(v) = (1-d)/N + d · Σ_{u→v} r_t(u) / outdeg(u)`, uniform
    * init `1/N`. Nodes = src ∪ dst of the edge list; nodes without
    * in-links keep the teleport term (the left join below); dangling
    * nodes (no OUT-links) simply leak their mass to the teleport term —
    * the rank mass is then no longer exactly 1, the standard simplified
    * treatment (callers needing stochastic-exact PageRank should add
    * self-loops or a dangling-mass redistribution pass).
    *
    * Every iteration's rank is rounded to 12 dp: in-contributions sum in
    * engine-chosen order, and without the per-iteration re-quantization
    * double-sum ordering noise would compound across iterations — with
    * it, any engine stating this recurrence reproduces the ranks
    * bit-for-bit (the DuckDB oracle does).
    *
    * 100 TB shape: the weighted edge list (src, dst, 1/outdeg) is built
    * once — one src-keyed co-shuffled join against the outdegree
    * aggregate — and persisted, so each iteration costs exactly two
    * exchanges: ranks join edges on src, contributions aggregate on dst
    * (map-side combinable). Ranks are node-sized, edges edge-sized;
    * nothing is ever collected or broadcast (node counts at web scale
    * dwarf broadcast limits). `N` is one driver-side scalar count.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iters: Int = 5): DataFrame = {
    require(damping > 0 && damping < 1, s"damping out of (0,1): $damping")
    require(iters >= 1 && iters <= 50,
      s"iters out of [1,50] (fixed-iteration contract, see scaladoc): $iters")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
    val n = nodes.count()
    val outDeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val weighted = e.join(outDeg, Seq("__src"))
      .select(col("__src"), col("__dst"),
        (lit(1.0) / col("__deg").cast("double")).as("__w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val teleport = (1.0 - damping) / n.toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n.toDouble))
    for (_ <- 1 to iters) {
      val contribs = ranks.join(weighted, ranks("node") === weighted("__src"))
        .groupBy(col("__dst"))
        .agg(sum(col("rank") * col("__w")).as("__in"))
      ranks = nodes.join(contribs, nodes("node") === contribs("__dst"), "left")
        .select(col("node"),
          round(lit(teleport) + lit(damping) * coalesce(col("__in"), lit(0.0)), 12)
            .as("rank"))
    }
    ranks
  }
}
