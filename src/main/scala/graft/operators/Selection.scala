package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.zround

/** Training-data selection under token budgets: keep documents in greedy
  * quality order (score desc, id asc as the deterministic tiebreak) while
  * the RUNNING cost total stays within budget — the data-mixing primitive
  * behind "take the best N-billion tokens of this corpus", globally
  * ([[selectUnderBudget]]) or per domain ([[selectUnderBudgetByGroup]],
  * the mixing-weights shape: each domain gets its own token budget).
  *
  * Semantics are the SQL prefix formulation (the DuckDB oracle states it
  * directly): `sum(cost) OVER (PARTITION BY domain ORDER BY score DESC,
  * id) <= budget(domain)`. The first row to cross its budget is dropped
  * along with everything after it in the same domain, even if some later
  * small row would still fit (prefix, not knapsack).
  *
  * 100 TB shape: a naive translation is a cumulative-sum window — ONE
  * task sorts the whole corpus in the global case, one task per domain
  * (n/|domains| rows each) in the grouped case. Instead the prefix is
  * located in two passes, like a distributed quantile:
  *   1. uniform score buckets (`width_bucket` over the min/max range, one
  *      narrow pass) → per-(domain, bucket) cost sums, ≤ |domains| ×
  *      (buckets+2) rows collected to the driver, prefix-summed
  *      best-bucket-first to find each domain's ONE boundary bucket where
  *      its running total crosses its budget;
  *   2. buckets strictly above a domain's boundary are kept wholesale (no
  *      sort, no window — their total provably fits); only the boundary
  *      slices — expected n/buckets of each domain — pay the exact
  *      (score desc, id) cumulative window, with the leftover budget.
  * Identical scores land in the same bucket, so the id tiebreak never
  * crosses a bucket edge and the result is bit-identical to the window
  * formulation at any bucket count (spec-pinned). A domain whose scores
  * are ALL equal degenerates to one boundary slice = that domain's full
  * window — inherent, since every row then competes on id for the same
  * budget.
  */
object Selection {

  /** Global-budget selection. Rows with null or non-finite scores are
    * excluded; null costs count as 0 (kept for free, like the window
    * formulation's null-skipping sum).
    */
  def selectUnderBudget(df: DataFrame, idCol: String, scoreCol: String,
                        costCol: String, budget: Long,
                        buckets: Int = 10000): DataFrame =
    run(df.withColumn("__grp", lit("")), "__grp", idCol, scoreCol, costCol,
      Map("" -> budget), buckets).drop("__grp")

  /** Per-group top-k selection: the k best rows of every group by
    * (score desc, id asc), returned as `(group, id, score, rn)` with a
    * 1-based dense rank — "keep the 1000 best documents per language"
    * without a window. The ranking is the [[graft.functions.TopKOps]]
    * bounded-heap aggregate: every partition keeps at most k candidates
    * per group (map-side combine), so no task ever sorts a group's full
    * row set and a skewed group costs O(n·log k), not a one-reducer sort.
    * The per-group window formulation this replaces is the same plan
    * Similarity's ANN ranking already banned at corpus scale.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKOps.topK(k, col(scoreCol), col(idCol)).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol), col("col.id").as(idCol),
        col("col.score").as(scoreCol), (col("pos") + 1).cast("long").as("rn"))

  /** Reciprocal rank fusion over per-group top-`topK` lists: for each
    * score column `c_i` take the group's `topK` best rows by
    * (`c_i` desc, id asc); a document's fused score is
    * `Σ_i 1/(k0 + rank_i)` over the lists it appears in (absent-from-list
    * contributes nothing — standard RRF over truncated rankings, the
    * quality-ensemble primitive: fuse a length ranking, an LM ranking,
    * and a classifier ranking without calibrating their scales).
    * Output: (group, id, rank_1.., rrf) with null ranks for missing
    * lists, `rrf` rounded 6 dp.
    *
    * Cross-engine exactness: per-doc the sum has ≤ |scoreCols| terms
    * added in FIXED column order (each term a double of the form
    * 1/(k0+r), r ≤ topK integer), so any engine stating the same
    * left-to-right sum reproduces it bit-for-bit before the rounding.
    *
    * 100 TB shape: each list comes from the [[topKPerGroup]]
    * bounded-heap aggregate (map-side combine, O(n·log k) per skewed
    * group, never a per-group full sort); the fusion joins are over
    * lists of ≤ |groups|·topK rows — corpus-sized data is touched once
    * per ranking, in the aggregate. No window ever sees the corpus.
    */
  def rankFusion(df: DataFrame, groupCol: String, idCol: String,
                 scoreCols: Seq[String], topK: Int, k0: Int = 60): DataFrame = {
    require(scoreCols.nonEmpty, "rankFusion needs at least one score column")
    require(topK > 0, s"topK must be positive: $topK")
    // rank each score column, then exactly [[rrfFuseRanks]] — ONE fusion
    // tail in this file, so the reciprocal-sum arithmetic cannot drift
    // between the same-relation and cross-relation forms
    rrfFuseRanks(scoreCols.map(c =>
      topKPerGroup(df.select(col(groupCol), col(idCol), col(c)),
        groupCol, c, idCol, topK)), groupCol, idCol, "rn", k0)
  }

  /** RRF fusion of ALREADY-RANKED lists — [[rankFusion]]'s retrieval
    * twin: each input is a `(group, id, rank)` relation from a different
    * retriever (dense ANN, sparse BM25/TF-IDF, a recency sort …), and
    * the fusion full-joins them on (group, id) and sums
    * `1/(k0 + rank)` per list, 0 when a list missed the id — the hybrid
    * dense+sparse serving pattern where the rankings come from DIFFERENT
    * relations and can't share one score table. Output
    * `(group, id, rank_1.., rrf)` with null ranks for misses, `rrf`
    * rounded 6 dp.
    *
    * Cross-engine exactness: [[rankFusion]]'s contract verbatim — ≤
    * |lists| double terms added in fixed list order, each `1/(k0+r)`
    * with integer `r`, so any engine stating the same left-to-right sum
    * reproduces it bit-for-bit before the rounding.
    *
    * 100 TB shape: inputs are top-k relations by contract (bounded-heap
    * aggregates upstream), so every join here is over lists of ≤
    * queries·k rows — the fusion never touches the corpus.
    */
  def rrfFuseRanks(lists: Seq[DataFrame], groupCol: String, idCol: String,
                   rankCol: String, k0: Int = 60): DataFrame =
    rrfFuseRanksWeighted(lists, groupCol, idCol, rankCol,
      Seq.fill(lists.size)(1.0), k0)

  /** WEIGHTED RRF — [[rrfFuseRanks]] with a per-list coefficient:
    * `Σ w_i/(k0+rank_i)`, the alpha knob every hybrid deployment tunes
    * when one arm is known stronger (e.g. dense 0.7 / sparse 0.3).
    * [[rrfFuseRanks]] IS this at all-ones weights — one fusion tail, so
    * the reciprocal-sum arithmetic cannot drift between the forms.
    * Weights must be positive (a zero weight is a list that should not
    * be in the fusion; a negative one inverts the ranking semantics).
    */
  def rrfFuseRanksWeighted(lists: Seq[DataFrame], groupCol: String,
                           idCol: String, rankCol: String,
                           weights: Seq[Double], k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuseRanks needs at least one ranked list")
    require(k0 > 0, s"k0 must be positive: $k0")
    require(weights.size == lists.size,
      s"${lists.size} lists need ${lists.size} weights, got ${weights.size}")
    require(weights.forall(_ > 0.0), s"weights must be positive: $weights")
    val named = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(groupCol), col(idCol),
        col(rankCol).cast("long").as(s"rank_${i + 1}"))
    }
    val joined = named.reduce((a, b) => a.join(b, Seq(groupCol, idCol), "full"))
    val terms = lists.indices.map(i =>
      when(col(s"rank_${i + 1}").isNotNull,
        lit(weights(i)) / (lit(k0.toDouble) + col(s"rank_${i + 1}").cast("double")))
        .otherwise(lit(0.0)))
    joined.withColumn("rrf", round(terms.reduce(_ + _), 6))
  }

  /** SCORE-based list fusion — CombSUM / CombMNZ (Fox & Shaw's classic
    * rules), the complement of [[rrfFuseRanks]] when the arms' scores
    * themselves carry signal the ranks flatten: each list's scores
    * min-max normalize PER GROUP onto [0, 1] (a constant-score or
    * single-row list normalizes to 1.0 — present beats absent), the
    * normalized terms sum across lists in fixed order (0 for a miss),
    * and CombMNZ multiplies the sum by `n_lists`, the number of lists
    * that returned the id — rewarding multi-arm agreement. Output
    * `(group, id, n_lists, fused)`, `fused` rounded 6 dp.
    *
    * Cross-engine exactness: per-(list, group) min/max are exact
    * aggregates over the top-k rows; `(s−min)/(max−min)` is one IEEE
    * subtract-divide on score values that are bit-identical by the
    * retrieval contract (exact-decimal dot products cast once); the
    * ≤ |lists| term sum is stated in fixed list order; the MNZ
    * multiply is by an integer count.
    *
    * 100 TB shape: the [[rrfFuseRanks]] contract — inputs are top-k
    * relations, every join and per-group extremum here is over
    * ≤ queries·k rows; the fusion never touches the corpus.
    */
  def fuseScoresMinMax(lists: Seq[DataFrame], groupCol: String,
                       idCol: String, scoreCol: String,
                       mnz: Boolean = true): DataFrame = {
    require(lists.nonEmpty, "fuseScoresMinMax needs at least one scored list")
    val normed = lists.zipWithIndex.map { case (l, i) =>
      val s = l.select(col(groupCol), col(idCol),
        col(scoreCol).cast("double").as("__s"))
      val ext = s.groupBy(col(groupCol))
        .agg(min(col("__s")).as("__mn"), max(col("__s")).as("__mx"))
      // the extrema relation is ONE row per group (≤ queries rows by the
      // top-k input contract) — broadcast it so normalization never
      // sort-merges the lists
      s.join(broadcast(ext), Seq(groupCol))
        .select(col(groupCol), col(idCol),
          when(col("__mx") > col("__mn"),
            (col("__s") - col("__mn")) / (col("__mx") - col("__mn")))
            .otherwise(lit(1.0)).as(s"__n${i + 1}"))
    }
    val joined = normed.reduce((a, b) => a.join(b, Seq(groupCol, idCol), "full"))
    val nLists = lists.indices.map(i =>
      when(col(s"__n${i + 1}").isNotNull, lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
    val sumExpr = lists.indices.map(i => coalesce(col(s"__n${i + 1}"), lit(0.0)))
      .reduce(_ + _)
    joined
      .withColumn("n_lists", nLists.cast("long"))
      .withColumn("fused",
        round(if (mnz) sumExpr * nLists.cast("double") else sumExpr, 6))
      .select(col(groupCol), col(idCol), col("n_lists"), col("fused"))
  }

  /** Ranked-list EVALUATION — MRR and binary-relevance nDCG of a run
    * against a ranked gold list, per group: the retrieval metrics recall
    * reports don't state (recall@k treats rank 1 and rank k the same;
    * MRR/nDCG price WHERE in the list the hits landed). Per group,
    * over the top-`k` of both lists:
    * `n_hit` = |gold ∩ run|, `mrr` = 1/(run rank of the first gold item)
    * (0.0 when the run missed every gold item),
    * `ndcg` = Σ_hits 1/log2(run_rank+1) ÷ Σ_gold 1/log2(gold_rank+1) —
    * the ideal DCG comes from the GOLD list's own ranks, so no sequence
    * generation and the report stays fully relational.
    *
    * Cross-engine exactness: each 1/log2(rank+1) term is rounded to
    * 6 dp onto DECIMAL(9,6) before summing (order-independent exact
    * sums), mrr/ndcg are one terminal division each.
    *
    * 100 TB shape: both inputs are top-k relations by contract
    * (bounded-heap aggregates upstream — the [[rrfFuseRanks]] cost
    * note), so the join and rollup touch ≤ groups·k rows.
    */
  def rankedEvalReport(gold: DataFrame, goldGroupCol: String,
                       goldIdCol: String, goldRankCol: String,
                       run: DataFrame, runGroupCol: String,
                       runIdCol: String, runRankCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    def term(c: Column): Column =
      round(lit(1.0) / log2(c.cast("double") + lit(1.0)), 6)
        .cast("decimal(9,6)")
    val g = gold.select(col(goldGroupCol).as("__g"),
      col(goldIdCol).as("__id"), col(goldRankCol).cast("long").as("__grn"))
      .filter(col("__grn") <= k)
    val r = run.select(col(runGroupCol).as("__g"),
      col(runIdCol).as("__id"), col(runRankCol).cast("long").as("__rn"))
      .filter(col("__rn") <= k)
    g.join(r, Seq("__g", "__id"), "left")
      .groupBy(col("__g"))
      .agg(
        count(col("__rn")).cast("long").as("n_hit"),
        coalesce(round(lit(1.0) / min(col("__rn")).cast("double"), 6),
          lit(0.0)).as("mrr"),
        sum(when(col("__rn").isNotNull, term(col("__rn")))
          .otherwise(lit(0).cast("decimal(9,6)"))).as("__dcg"),
        sum(term(col("__grn"))).as("__idcg"))
      .withColumn("ndcg",
        round(col("__dcg").cast("double") / col("__idcg").cast("double"), 6))
      .select(col("__g").as(goldGroupCol), col("n_hit"), col("mrr"),
        col("ndcg"))
  }

  /** Per-stratum quantile gate: keep rows whose score is at or above
    * their group's `quantile` threshold — "keep the top 60% of every
    * language" as an adaptive per-stratum cutoff instead of one global
    * constant. Thresholds are a tiny per-group aggregate (one row per
    * stratum) broadcast back onto the corpus; no window, no per-group
    * sort of the output side.
    *
    * 100 TB note: `exact = true` uses `percentile()`, whose aggregation
    * buffer holds each group's value multiset — fine when strata are
    * few and the threshold table is what you keep, but the buffer grows
    * with group size. For corpus-scale strata set `exact = false`:
    * `approx_percentile` keeps a fixed-size sketch per group (same plan
    * shape, bounded state) at the cost of a bounded rank error — the
    * DuckDB oracle states the exact variant.
    */
  def keepAboveQuantile(df: DataFrame, groupCol: String, scoreCol: String,
                        quantile: Double, exact: Boolean = true): DataFrame = {
    require(quantile > 0.0 && quantile < 1.0, s"quantile out of (0,1): $quantile")
    val agg =
      if (exact) expr(s"percentile(`$scoreCol`, $quantile)")
      else expr(s"approx_percentile(`$scoreCol`, $quantile, 10000)")
    val thresholds = df.groupBy(col(groupCol)).agg(agg.as("__thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Per-domain budgets (data mixing). Rows whose `groupCol` value has no
    * budget entry are DROPPED — an unbudgeted domain contributes nothing
    * to the mix. Score/cost null handling as in [[selectUnderBudget]].
    */
  def selectUnderBudgetByGroup(df: DataFrame, groupCol: String, idCol: String,
                               scoreCol: String, costCol: String,
                               budgets: Map[String, Long],
                               buckets: Int = 10000): DataFrame =
    run(df, groupCol, idCol, scoreCol, costCol, budgets, buckets)

  private def run(df: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, costCol: String,
                  budgets: Map[String, Long], buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(budgets.nonEmpty, "at least one budget is required")
    // the driver prefix walk reads the group value as a string, and the
    // budget keys are strings — a non-string group column would CCE at
    // collect time with no hint; callers control neither through the
    // type system
    require(df.schema(groupCol).dataType == org.apache.spark.sql.types.StringType,
      s"groupCol must be a string column, got " +
        df.schema(groupCol).dataType.catalogString)
    // a null cost counts as 0 — kept for free, exactly like the window
    // formulation, whose sum() skips nulls
    val cost = coalesce(col(costCol).cast("long"), lit(0L))
    val score = col(scoreCol).cast("double")
    // NaN/±Infinity are excluded like null: width_bucket is NULL on a
    // non-finite value OR endpoint (a driver NPE in the prefix walk) and
    // NaN's sort position is engine-specific — a non-finite "quality
    // score" is an upstream bug either way. ONE predicate referencing the
    // score ONCE: null/NaN/±Inf all fail `abs(x) <= MaxValue`, and when
    // the pushed-down filter substitutes the caller's (often expensive)
    // score expression, it substitutes it once — the earlier three-term
    // form (isNotNull && !isnan && !isin) tripled the score evaluation
    // and doubled q77/q78 wall time at sf0.1.
    //
    // A NEGATIVE cost breaks the prefix semantics (the running sum stops
    // being monotone, so whole-bucket keeps/drops diverge from the window
    // formulation) — fail loudly per row; the assert lives in the filter
    // predicate so column pruning cannot elide it.
    //
    // localCheckpoint: four downstream reads (range agg, per-bucket
    // collect, keep-whole, boundary) would otherwise each re-evaluate the
    // caller's score expression over the corpus — the same recompute
    // pattern the connectedComponents edge list hit (2.5× there).
    val scored = df.filter(abs(score) <= lit(Double.MaxValue))
      .filter(col(groupCol).isin(budgets.keys.toSeq: _*))
      .filter(coalesce(assert_true(cost >= 0,
        concat(lit("selectUnderBudget: negative cost "), cost.cast("string"),
          lit(" — prefix selection needs non-negative costs"))), lit(true)))
      .localCheckpoint()
    val range = scored.agg(min(score), max(score)).head()
    if (range.isNullAt(0)) return df.limit(0).drop()
    val (lo, hi) = (range.getDouble(0), range.getDouble(1))

    // bucket 1..buckets over [lo, hi); score == hi gets buckets+1 — any
    // deterministic monotone bucketing works, balance only affects the
    // boundary slices' size, never the result. One GLOBAL range serves
    // every domain (per-domain ranges would change nothing but the
    // boundary slice sizes).
    val bucketed = scored.withColumn("__bkt",
      if (lo == hi) lit(1L) else width_bucket(score, lit(lo), lit(hi), lit(buckets)))
    val perBucket = bucketed.groupBy(col(groupCol).as("__g"), col("__bkt"))
      .agg(sum(cost).as("__c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    // per domain: walk buckets best-first until the budget would be
    // crossed; that bucket is the boundary, everything above fits whole
    val cuts: Map[String, (Long, Long)] = perBucket.flatMap { case (g, rows) =>
      val budget = budgets(g)
      var cum = 0L
      var cut = Option.empty[(Long, Long)]
      rows.sortBy(-_._2).foreach { case (_, bkt, c) =>
        if (cut.isEmpty) {
          if (cum + c > budget) cut = Some((bkt, cum)) else cum += c
        }
      }
      cut.map(g -> _)
    }
    // domains with no cut fit entirely: cut sentinel -1 keeps every bucket
    val cutExpr = budgets.keys.toSeq.foldLeft(lit(-1L)) { (acc, g) =>
      cuts.get(g).map(c => when(col(groupCol) === g, lit(c._1)).otherwise(acc))
        .getOrElse(acc)
    }
    val spentExpr = budgets.keys.toSeq.foldLeft(lit(0L)) { (acc, g) =>
      cuts.get(g).map(c => when(col(groupCol) === g, lit(c._2)).otherwise(acc))
        .getOrElse(acc)
    }
    val budgetExpr = budgets.foldLeft(lit(0L)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    val keepWhole = bucketed.filter(col("__bkt") > cutExpr).drop("__bkt")
    // the slices that need exact order: one window per domain over
    // ~n/buckets rows each (bounded by construction — the boundary is ONE
    // bucket per domain), with whatever budget the whole buckets left
    // over. Partitioning includes __bkt — semantically redundant after
    // the equality filter, but it keeps the partition spec a real
    // attribute in the global case, where the folded constant group
    // column otherwise degrades the spec to "no partition defined"
    val boundary = bucketed.filter(col("__bkt") === cutExpr)
      .withColumn("__run", sum(cost).over(
        Window.partitionBy(col(groupCol), col("__bkt"))
          .orderBy(score.desc, col(idCol))))
      .filter(col("__run") <= budgetExpr - spentExpr)
      .drop("__bkt", "__run")
    keepWhole.unionByName(boundary)
  }

  /** Conformal-style threshold calibration: learn the score cutoff on a
    * held-out calibration slice, then report how it actually performs
    * out-of-sample — the audit run before turning a [[keepAboveQuantile]]
    * gate on in production (a threshold fit and evaluated on the same
    * rows always "covers"; only the split makes the keep-rate claim
    * honest). The split is the deterministic [[Sampling.hashBucket]]
    * permille, so the report is reproducible row-for-row.
    *
    * Output: ONE row `(n_calib, n_eval, threshold, target_keep_frac,
    * eval_keep_frac, gap)` — the calibration-quantile cutoff (6 dp; the
    * eval filter compares against the 9-dp-QUANTIZED threshold, the
    * cross-engine-stable form — only the reported column is 6 dp), the
    * intended keep fraction
    * `1 − keepQuantile`, the observed eval keep fraction (exact
    * BIGINT/BIGINT division), and `gap = observed − intended`.
    *
    * 100 TB shape: TWO corpus passes — one aggregation computing the
    * calibration percentile and both split counts together (the
    * calibration scores enter via a null-skipping `when`, so no separate
    * calibration scan), then one eval pass against the broadcast scalar
    * threshold. `exact = false` swaps in the mergeable
    * `approx_percentile` sketch (the q102 rule) for corpus-scale
    * calibration slices.
    */
  def conformalCoverageReport(df: DataFrame, idCol: String, scoreCol: String,
                              calibPermille: Int, keepQuantile: Double,
                              exact: Boolean = true,
                              salt: String = "conf"): DataFrame = {
    require(calibPermille >= 1 && calibPermille <= 999,
      s"calibPermille out of [1,999]: $calibPermille")
    require(keepQuantile > 0.0 && keepQuantile < 1.0,
      s"keepQuantile out of (0,1): $keepQuantile")
    val isCalib = Sampling.hashBucket(col(idCol), salt) < calibPermille
    val calibScore = when(isCalib, col(scoreCol))
    val thrAgg =
      if (exact) percentile(calibScore, lit(keepQuantile))
      else percentile_approx(calibScore, lit(keepQuantile), lit(10000))
    val base = df.filter(col(scoreCol).isNotNull)
    val cal = base.agg(
      sum(when(isCalib, 1L).otherwise(0L)).as("n_calib"),
      sum(when(isCalib, 0L).otherwise(1L)).as("n_eval"),
      thrAgg.as("__thr"))
    // the coverage comparison quantizes the threshold at 9 dp: an
    // interpolated quantile can differ across engines in the last ulp,
    // and score ties straddling the split boundary would flip on it —
    // the 9-dp grid restores a cross-engine-stable comparison while
    // moving the cutoff by at most 5e-10 score units
    val kept = base.filter(!isCalib)
      .crossJoin(broadcast(cal.select(col("__thr"))))
      .agg(sum(when(col(scoreCol) >= round(col("__thr"), 9), 1L).otherwise(0L))
        .as("__kept"))
    cal.crossJoin(broadcast(kept))
      .select(col("n_calib"), col("n_eval"),
        round(col("__thr"), 6).as("threshold"),
        round(lit(1.0) - keepQuantile, 6).as("target_keep_frac"),
        round(col("__kept").cast("double") / col("n_eval").cast("double"), 6)
          .as("eval_keep_frac"),
        zround(col("__kept").cast("double") / col("n_eval").cast("double")
          - (lit(1.0) - keepQuantile), 6).as("gap"))
  }

  /** Curriculum ordering with round-robin source interleaving: rows sort
    * easiest-first WITHIN each group (`scoreCol` asc = difficulty proxy,
    * id ties), and the global curriculum position interleaves the groups
    * ARITHMETICALLY — `position = (rank_in_group − 1) · |groups| +
    * group_index` — so consecutive positions cycle through the sources
    * (no source runs, the data-ordering shape curriculum training
    * wants). Output: input columns + `(rank_in_group, position)`;
    * writing sorted by `position` is the consumer's `orderBy` (a
    * distributed range sort), never a global row_number here.
    *
    * 100 TB shape: one per-GROUP rank window (hash-partitioned by group —
    * the q01 flagship pattern; groups are sources, so partitions stay
    * balanced), a groups-sized index table broadcast back, and pure
    * per-row arithmetic for the position. NO global window: a global
    * row_number would funnel the corpus through one task, and the
    * arithmetic interleave is exactly equivalent for distinct
    * (rank, group_index) pairs, which ranks and indexes are by
    * construction.
    */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: String,
                      groupCol: String): DataFrame = {
    // NULL difficulty carries no order (and its window placement is
    // engine-divergent — the rankBiserial lesson): excluded up front
    val nn = df.filter(col(scoreCol).isNotNull && col(groupCol).isNotNull)
    val groups = nn.select(col(groupCol)).distinct()
    val gIdx = groups
      .groupBy()
      .agg(sort_array(collect_list(col(groupCol))).as("__gs"))
      .select(posexplode(col("__gs")).as(Seq("__gidx", groupCol)))
    val nGroups = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(lit(1)))
    val sized = gIdx.withColumn("__ng", nGroups)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol), col(idCol))
    nn.join(broadcast(sized), Seq(groupCol))
      .withColumn("rank_in_group", row_number().over(w).cast("long"))
      .withColumn("position",
        (col("rank_in_group") - 1) * col("__ng") + col("__gidx").cast("long"))
      .drop("__gidx", "__ng")
  }
}
