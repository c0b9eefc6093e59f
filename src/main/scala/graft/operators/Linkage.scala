package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage — approximate string matching between two
  * relations without a cartesian product. The reference exposes exact and
  * regex id matching (client.py's CVE filters); entity resolution over
  * noisy keys (OCR'd ids, scraped titles, vendor name variants) needs
  * edit-distance matching, which naively is O(n·m) comparisons. This is
  * the standard scalable shape: q-gram blocking → candidate equi-join →
  * exact edit-distance verify on candidates only.
  *
  * Blocking contract (part of the operator's semantics, not an internal
  * heuristic): a pair is a CANDIDATE iff the two strings share at least
  * one character q-gram whose document frequency on BOTH sides is ≤
  * `maxGramDf`. The df cap ("stop-grams", the classic q-gram blocking
  * refinement) is what keeps the join from degenerating on corpora where
  * a few grams occur everywhere — exactly the grams that carry no
  * discriminating signal. Recall is bounded by the blocking (a pair all
  * of whose shared grams are stop-grams is not compared); the DuckDB
  * oracle twin states the identical blocked semantics, so the contract
  * is pinned cross-engine.
  *
  * 100 TB shape: gram explosion is a narrow per-row pass; the df filter
  * is a gram-sized map-side-combinable aggregation; candidates come from
  * an equi-join on the gram key (never all-pairs); `levenshtein` (a
  * codegen'd Spark built-in) runs on candidate pairs only. The df cap
  * bounds per-gram join fan-out at `maxGramDf²`, so no single gram key
  * can produce a quadratic bucket — the same skew-bounding role the
  * band-size cap plays in the MinHash LSH family.
  *
  * GRAM-SPACE SIZING RULE (load-bearing, the [[Sampling.assignShards]]
  * analogue): average gram df ≈ n·L / |alphabet|^q, so `q` must grow
  * with the corpus — choose q such that |alphabet|^q ≳ corpus rows, or
  * typical grams blow past `maxGramDf` and recall collapses to the few
  * grams that survive the cap (q = 3 is right for 10⁴-10⁶ name tables;
  * use q = 5+ at 10⁸ rows, or block on whole tokens when a natural
  * token vocabulary grows with the corpus). PipelineScaleBench's
  * `pipe_fuzzy_link` stage demonstrates the q = 5 regime at 500k/5M.
  */
object Linkage {

  /** Distinct (id, gram) pairs of `strCol`'s character q-grams, df-capped. */
  private def grams(df: DataFrame, idCol: String, strCol: String, q: Int,
                    maxGramDf: Long): DataFrame = {
    val g = df
      .select(col(idCol).as("__id"),
        // sequence(1, n) is DESCENDING for n < 1 (Spark generates [1, 0]),
        // so strings shorter than q must short-circuit to an empty array
        explode(expr(
          s"CASE WHEN length($strCol) < $q THEN array() " +
            s"ELSE transform(sequence(1, length($strCol) - ${q - 1}), " +
            s"i -> substring($strCol, i, $q)) END")).as("__g"))
      .distinct()
    val dfCounts = g.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxGramDf)
    g.join(dfCounts.select("__g"), Seq("__g"))
  }

  /** Blocked fuzzy join: all (idL, idR) pairs whose strings share a
    * sub-`maxGramDf` q-gram AND are within `maxDist` Levenshtein edits.
    * Output: (idL, idR, dist). Ids must be unique per side.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                idLeft: String, strLeft: String,
                idRight: String, strRight: String,
                maxDist: Int, q: Int = 3, maxGramDf: Long = 100): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    require(q > 0, s"q must be positive: $q")
    require(maxGramDf > 0, s"maxGramDf must be positive: $maxGramDf")
    val lg = grams(left.select(col(idLeft), col(strLeft)), idLeft, strLeft, q, maxGramDf)
      .select(col("__id").as("__idl"), col("__g"))
    val rg = grams(right.select(col(idRight), col(strRight)), idRight, strRight, q, maxGramDf)
      .select(col("__id").as("__idr"), col("__g"))
    val cand = lg.join(rg, Seq("__g"))
      .select(col("__idl"), col("__idr")).distinct()
    cand
      .join(left.select(col(idLeft).as("__idl"), col(strLeft).as("__sl")), Seq("__idl"))
      .join(right.select(col(idRight).as("__idr"), col(strRight).as("__sr")), Seq("__idr"))
      // the banded variant: O(maxDist·len) per pair instead of O(len²),
      // -1 when the distance exceeds the threshold (filtered out)
      .withColumn("dist", levenshtein(col("__sl"), col("__sr"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("__idl").as(idLeft), col("__idr").as(idRight), col("dist"))
  }

  /** Sorted-neighborhood near-dup pairs — the OTHER classic blocking
    * family ([[fuzzyJoin]] blocks by shared content q-grams; this blocks
    * by SORT ORDER): sort the corpus by `keyCol`, compare each row only
    * to its `window` successors, verify with Levenshtein. Catches the
    * "same record, one typo early in the string" pairs that sort
    * adjacently, at linear candidate cost `n·window`.
    *
    * Blocking contract (part of the semantics, pinned by the oracle
    * twin): rows are ranked by `(key, id)` WITHIN prefix blocks (the
    * first `prefixLen` chars of the key); a pair is a candidate iff both
    * rows share a block and their ranks differ by ≤ `window`. Pairs that
    * straddle a block boundary are NOT compared — the standard blocked-
    * SNM recall tradeoff, which is also what makes the global sort
    * shardable. Output `(idA, idB, dist)`, A before B in block order.
    *
    * SIZING RULE (the [[fuzzyJoin]] gram-space analogue): blocks must
    * stay small enough for a within-block rank — `prefixLen` must grow
    * with the corpus until |alphabet|^prefixLen ≳ rows/10⁶, or a hot
    * prefix becomes one giant sort partition. At 100 TB that means
    * prefixes of 8+ chars on natural text; the within-block window is
    * then the ONLY sort, and the bucket equi-join (each rank-bucket
    * joins itself and its successor — never all-pairs) bounds fan-out at
    * `2·window` per row regardless of block size.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, keyCol: String,
                         window: Int, prefixLen: Int,
                         maxDist: Int): DataFrame = {
    require(window >= 1, s"window must be positive: $window")
    require(prefixLen >= 1, s"prefixLen must be positive: $prefixLen")
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__blk")).orderBy(col("__k"), col("__id"))
    val ranked = df
      .select(col(idCol).as("__id"), col(keyCol).as("__k"),
        substring(col(keyCol), 1, prefixLen).as("__blk"))
      .filter(col("__k").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__b", ((col("__rn") - 1) / window).cast("long"))
    val a = ranked.select(col("__blk"), col("__b"),
      col("__id").as("__ida"), col("__k").as("__ka"), col("__rn").as("__ra"))
    // each rank-bucket probes itself and its successor bucket: every
    // pair within `window` ranks lands in exactly one of the two
    val b = ranked.select(col("__blk"),
      explode(array(col("__b"), col("__b") - 1)).as("__b"),
      col("__id").as("__idb"), col("__k").as("__kb"), col("__rn").as("__rb"))
    a.join(b, Seq("__blk", "__b"))
      .filter(col("__rb") > col("__ra") && col("__rb") - col("__ra") <= window)
      // banded Levenshtein: O(maxDist·len) per candidate, -1 = over
      .withColumn("dist", levenshtein(col("__ka"), col("__kb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("__ida").as("idA"), col("__idb").as("idB"), col("dist"))
  }
}
