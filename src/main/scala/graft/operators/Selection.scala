package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data selection under a global token budget: keep documents in
  * greedy quality order (score desc, id asc as the deterministic tiebreak)
  * while the RUNNING cost total stays within budget — the data-mixing
  * primitive behind "take the best N-billion tokens of this corpus".
  *
  * Semantics are the SQL prefix formulation (the DuckDB oracle states it
  * directly): `sum(cost) OVER (ORDER BY score DESC, id) <= budget`. The
  * first row to cross the budget is dropped along with everything after
  * it, even if some later small row would still fit (prefix, not
  * knapsack).
  *
  * 100 TB shape: a naive translation is a GLOBAL cumulative-sum window —
  * one task sorting the corpus. Instead the prefix is located in two
  * passes, like a distributed quantile:
  *   1. uniform score buckets (`width_bucket` over the min/max range, one
  *      narrow pass) → per-bucket cost sums, ≤ `buckets`+2 rows collected
  *      to the driver, prefix-summed best-bucket-first to find the ONE
  *      boundary bucket where the running total crosses the budget;
  *   2. buckets strictly above the boundary are kept wholesale (no sort,
  *      no window — their total provably fits); only the boundary
  *      bucket — expected n/buckets of the corpus — pays the exact
  *      (score desc, id) cumulative window, with the leftover budget.
  * Identical scores land in the same bucket, so the id tiebreak never
  * crosses a bucket edge and the result is bit-identical to the global
  * window at any bucket count (spec-pinned against the one-window
  * formulation). A corpus whose scores are ALL equal degenerates to one
  * boundary bucket = the full window — inherent, since every row then
  * competes on id for the same budget.
  */
object Selection {

  def selectUnderBudget(df: DataFrame, idCol: String, scoreCol: String,
                        costCol: String, budget: Long,
                        buckets: Int = 10000): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val cost = col(costCol).cast("long")
    val score = col(scoreCol).cast("double")
    val scored = df.filter(col(scoreCol).isNotNull)
    val range = scored.agg(min(score), max(score)).head()
    if (range.isNullAt(0)) return df.limit(0)
    val (lo, hi) = (range.getDouble(0), range.getDouble(1))

    // bucket 1..buckets over [lo, hi); score == hi gets buckets+1 — any
    // deterministic monotone bucketing works, balance only affects the
    // boundary bucket's size, never the result
    val bucketed = scored.withColumn("__bkt",
      if (lo == hi) lit(1L) else width_bucket(score, lit(lo), lit(hi), lit(buckets)))
    val perBucket = bucketed.groupBy("__bkt")
      .agg(sum(cost).as("__c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1) // best scores live in the highest buckets
    var cum = 0L
    var cut = -1L
    var spentAbove = 0L
    perBucket.foreach { case (bkt, c) =>
      if (cut < 0) {
        if (cum + c > budget) { cut = bkt; spentAbove = cum }
        else cum += c
      }
    }
    if (cut < 0) return scored.drop("__bkt") // everything fits

    val keepWhole = bucketed.filter(col("__bkt") > cut).drop("__bkt")
    // the one bucket that needs exact order: a single-partition window over
    // ~n/buckets rows, with whatever budget the whole buckets left over
    val boundary = bucketed.filter(col("__bkt") === cut)
      .withColumn("__run", sum(cost).over(
        Window.orderBy(score.desc, col(idCol))))
      .filter(col("__run") <= budget - spentAbove)
      .drop("__bkt", "__run")
    keepWhole.unionByName(boundary)
  }
}
