package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and train/test splitting for corpus pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected set changes
  * with partitioning, task retries, and executor count — unacceptable for
  * training-data lineage, where a row's fate must be a pure function of
  * the row. These operators key every decision on a content hash
  * (md5, engine-portable and reproducible in any SQL dialect), so:
  *   - the same corpus always yields the same sample, on any cluster
  *     layout (shuffle-free: a narrow filter, pushdown-friendly);
  *   - train/test membership is stable under re-runs and incremental
  *     ingest (a new document never flips an old one's split);
  *   - different `salt`s give independent samples from one corpus.
  *
  * The hash bucket is `md5(salt ∥ id) mod 1000` (first 15 hex chars →
  * 60-bit int, bias < 2⁻⁵⁰ — immaterial at permille granularity).
  */
object Sampling {

  /** 60-bit long from an md5 hex string (first 15 hex chars → bias
    * < 2⁻⁵⁰ at permille granularity) — THE engine-portable hash core,
    * shared by sampling, shard assignment and CDC chunking so the
    * cross-engine recipe lives in exactly one place. DuckDB twin:
    * `('0x' || substr(md5Hex, 1, 15))::BIGINT`.
    */
  def hash60(md5Hex: Column): Column =
    conv(substring(md5Hex, 1, 15), 16, 10).cast("long")

  /** Permille bucket 0..999 for a row id — the sampling/splitting key. */
  def hashBucket(idCol: Column, salt: String = ""): Column =
    pmod(hash60(md5(concat(lit(salt), idCol.cast("string")))), lit(1000L))

  /** Keep ~`permille`/1000 of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, permille: Int, salt: String = ""): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of [0,1000]: $permille")
    df.filter(hashBucket(col(idCol), salt) < permille)
  }

  /** ABSOLUTE-size deterministic hash sample — exactly
    * `min(n, targetRows)` rows, no matter how big the corpus grows:
    * every id gets a permanent lottery ticket (its salted md5 hash, the
    * [[uniformKPerGroup]] fate rule) and the `targetRows` SMALLEST
    * tickets win, ties broken by id. This is the eval-sample form whose
    * bounded-cost CONTRACT holds by construction: [[hashSample]]'s
    * permille is PROPORTIONAL, so every O(m²) pair join or broadcast
    * built on it grows linearly with the corpus and the caller must
    * hand-shrink the permille at scale — here the downstream work is
    * pinned at the target no matter the corpus size, and the winner set
    * only churns by what new ids out-lottery old ones.
    *
    * Cross-engine exactness: tickets are `hash60 mod 2⁵⁰` (the
    * [[uniformKPerGroup]] rule — a 50-bit integer survives the
    * bounded-heap's double score EXACTLY; the raw 60-bit hash would not),
    * so the DuckDB twin is `ORDER BY ticket, id LIMIT targetRows` over
    * the identical integer tickets. Requires an INTEGRAL-typed UNIQUE id
    * (refused at plan time otherwise — the heap payload and the winner
    * semi-join both ride `cast("long")`, and a non-numeric id would cast
    * to null on BOTH sides, silently returning an EMPTY sample instead
    * of failing; every lifecycle verb in this repo fails fast, so this
    * one does too). Duplicate ids share one ticket, so every row of a
    * winning id survives the semi-join.
    *
    * 100 TB shape: one narrow (id, ticket) pass into a single
    * [[graft.functions.TopKOps.topK]] bounded heap (map-side partials —
    * each partition offers at most `targetRows` entries, the merge is
    * heap-sized), then a broadcast semi-join of the winner set back onto
    * the corpus. No sort, no window, no full shuffle.
    */
  def hashSampleN(df: DataFrame, idCol: String, targetRows: Int,
                  salt: String = "us"): DataFrame = {
    require(targetRows >= 1 && targetRows <= 1000000,
      s"targetRows out of [1, 1000000]: $targetRows")
    // plan-time fail-fast: a string/struct id casts to null inside both
    // the ticket heap and the winner join, which would silently yield an
    // EMPTY sample (and empty eval reports downstream) — refuse instead
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"hashSampleN needs an integral id column (the winner heap and " +
        s"semi-join ride cast-to-long); $idCol is $idType — cast it " +
        s"explicitly or key on a surrogate long id")
    val winners = df
      .select(col(idCol).as("__sid"))
      .withColumn("__negh",
        (-pmod(hash60(md5(concat(lit(salt), col("__sid").cast("string")))),
          lit(1L << 50))).cast("double"))
      .agg(graft.functions.TopKOps.topK(targetRows, col("__negh"),
        col("__sid").cast("long")).as("__top"))
      .select(explode(col("__top")).as("__e"))
      .select(col("__e.id").as("__wid"))
    df.join(broadcast(winners), col(idCol).cast("long") === col("__wid"),
      "left_semi")
  }

  /** Deterministic train/test split: rows whose bucket falls under
    * `testPermille` go to test, the rest to train. The two sides are
    * disjoint and together cover the corpus exactly.
    */
  def trainTestSplit(df: DataFrame, idCol: String, testPermille: Int,
                     salt: String = ""): (DataFrame, DataFrame) = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille out of [0,1000]: $testPermille")
    val bucket = hashBucket(col(idCol), salt)
    (df.filter(bucket >= testPermille), df.filter(bucket < testPermille))
  }

  /** Split labels as a column (for writing one partitioned output instead
    * of two scans): 'train' / 'test'.
    */
  def withSplitLabel(df: DataFrame, idCol: String, testPermille: Int,
                     salt: String = ""): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol), salt) < testPermille, lit("test")).otherwise(lit("train")))

  /** Deterministic training order: global sort by a salted content hash —
    * a reproducible shuffle (same corpus + salt → the same order on any
    * cluster layout), with a fresh salt per epoch for re-shuffling.
    * Compiles to one range exchange like any total sort.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, salt: String = ""): DataFrame =
    df.orderBy(md5(concat(lit(salt), col(idCol).cast("string"))), col(idCol))

  /** Deterministic shard assignment for training export: every row gets a
    * `(shard, pos)` — shard by salted content hash mod `nShards`, position
    * by 0-based rank within the shard ordered by (hash, id). This is the
    * reproducible "global shuffle then shard" layout a distributed data
    * loader consumes: same corpus + salt → identical shard files on any
    * cluster layout, and a fresh salt re-deals the whole corpus per epoch.
    *
    * 100 TB shape: one hash exchange on `shard` plus an in-partition sort
    * (the window never crosses shards). SIZING RULE (load-bearing): each
    * shard's (hash, id) sort runs as ONE task, so choose
    * `nShards ≈ corpus size / target shard size`, which at any real
    * corpus is far ABOVE the cluster's parallelism (a 100 TB corpus at
    * 1 GB shards is 100k shards). An `nShards` below the parallelism
    * (say 64 on a 1000-core cluster) leaves cores idle and hands each
    * task a ~corpus/nShards sort — 1.5 TB per task at 100 TB/64 — which
    * is a mis-sizing, not an operator limit; [[shardParallelismWarning]]
    * logs it. There is no global sort and no driver involvement.
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int,
                   salt: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    shardParallelismWarning(nShards, df.sparkSession.sparkContext.defaultParallelism)
      .foreach(org.slf4j.LoggerFactory.getLogger(Sampling.getClass).warn(_))
    val h = md5(concat(lit(salt), col(idCol).cast("string")))
    val shard = pmod(hash60(h), lit(nShards.toLong))
    df.withColumn("shard", shard)
      .withColumn("pos",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(h, col(idCol))) - 1).cast("long"))
  }

  /** The [[assignShards]] sizing-rule check, as a pure function (None =
    * sized correctly). Separated so the spec pins the rule without
    * scraping logs; assignShards logs whatever this returns.
    */
  private[graft] def shardParallelismWarning(nShards: Int, parallelism: Int): Option[String] =
    if (nShards < parallelism)
      Some(s"assignShards: nShards=$nShards is below the cluster parallelism " +
        s"($parallelism) — each shard's (hash, id) sort runs as ONE task over " +
        s"~1/$nShards of the corpus, leaving cores idle; size nShards ≈ " +
        "corpus size / target shard size (at or above the write parallelism)")
    else None

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES),
    * deterministic: each row gets priority `ln(u) / w` where `u` is its
    * 60-bit md5 uniform in (0,1) and `w > 0` its weight; the k rows with
    * the LARGEST priority are exactly a weighted sample without
    * replacement (Efraimidis & Spirakis 2006 — maximizing u^(1/w), taken
    * through ln, which is monotone). Keyed on the content hash, so the
    * selected set is a pure function of (corpus, salt): stable under
    * re-partitioning, retries and cluster layout, like every sampler here.
    *
    * 100 TB shape: a narrow projection + `TakeOrderedAndProject` — each
    * partition keeps its local top-k and only k-sized heads travel to the
    * driver-side merge; no global sort, no window, no shuffle of the
    * corpus. Sized for k up to ~10⁶ (the heads are k × partitions rows);
    * for billion-row samples switch to a threshold-split two-pass (find
    * the k-th priority via quantile, then filter), same determinism.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.withColumn("__es_key", esPriority(col(idCol), col(weightCol), salt))
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** The Efraimidis–Spirakis priority `ln(u)/w` with `u = (hash60 + 0.5)
    * / 2^60 ∈ (0,1)` strictly — ln(0) can never occur — and every
    * operation (long→double, add, divide) IEEE-exact and engine-portable;
    * the DuckDB twin states the identical arithmetic. Shared by
    * [[weightedSample]] and [[weightedSamplePerGroup]].
    */
  def esPriority(idCol: Column, weightCol: Column, salt: String = ""): Column = {
    val u = (hash60(md5(concat(lit(salt), idCol.cast("string"))))
      .cast("double") + lit(0.5)) / lit(1152921504606846976.0 /* 2^60 */)
    log(u) / weightCol.cast("double")
  }

  /** Per-group weighted sampling without replacement: the k best
    * Efraimidis–Spirakis priorities WITHIN each group — "draw 20 docs per
    * language ∝ quality" as one pass. Ranks come from the `BoundedTopK`
    * bounded-heap aggregate (score DESC, id ASC — identical to the
    * row_number formulation), so the exchange carries groups × partitions
    * × k heap entries, never the corpus: no per-group window, no
    * per-group sort. Output: (group, id, rn), rn 1-based.
    */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, weightCol: String,
                             groupCol: String, k: Int,
                             salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    Selection.topKPerGroup(
      df.withColumn("__es_key", esPriority(col(idCol), col(weightCol), salt)),
      groupCol, "__es_key", idCol, k)
      .select(col(groupCol), col(idCol), col("rn"))
  }

  /** Leakage-safe train/test split: exact-duplicate documents ALWAYS land
    * in the same split. A plain per-row hash split leaks training rows
    * into the eval set whenever the corpus still carries duplicates (the
    * classic benchmark-contamination path); here the split key is the
    * duplicate GROUP's representative (min id over equal content
    * digests), so every copy of a text follows its group. Composes with
    * the dedup family: run it before dedup (safe even if dedup is
    * skipped) or after (degenerates to the plain split, same labels).
    *
    * 100 TB shape: the representative is a map-side-combinable min over
    * the digest key (digest-sized exchange) joining back co-shuffled on
    * the same key — attaching a group-dependent label requires
    * co-locating each row with its group exactly once, so the corpus
    * pays ONE digest-keyed shuffle (the same single-shuffle bill as
    * exact dedup); no window anywhere. The digest table is
    * distinct-text-sized — never assumed broadcastable.
    */
  def leakSafeSplit(df: DataFrame, idCol: String, textCol: String,
                    testPermille: Int, salt: String = ""): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille out of [0,1000]: $testPermille")
    val keyed = df.withColumn("__dig", md5(col(textCol)))
    val reps = keyed.groupBy(col("__dig")).agg(min(col(idCol)).as("__rep"))
    keyed.join(reps, Seq("__dig"))
      .withColumn("split",
        when(hashBucket(col("__rep"), salt) < testPermille, lit("test"))
          .otherwise(lit("train")))
      .drop("__dig", "__rep")
  }

  /** Temperature-based group rebalancing (the multilingual-corpus sampler
    * of XLM-R / mT5): each group's keep probability is
    * `q_g = clamp(c · n_g^(α-1), 1)` with `c = N·frac / Σ_g n_g^α`, so the
    * kept corpus has expected size `frac·N` while group shares are
    * flattened toward uniform as α → 0 (α = 1 degenerates to plain
    * hash-sampling at rate `frac`). Row fate is the usual content-hash
    * uniform — deterministic under any layout, stable under re-runs.
    *
    * Cross-engine exactness: the group weights `n_g^α` are rounded to
    * 6 dp and summed as DECIMAL (a handful of groups, but double-sum
    * order would still be engine-chosen — decimal removes the question);
    * `q_g` is rounded to 12 dp so the final threshold compare is
    * bit-identical in any engine stating the same arithmetic.
    *
    * 100 TB shape: one map-side-combinable group count (groups-sized), a
    * scalar total, the rate table broadcast back, then a narrow filter
    * over the corpus — no corpus shuffle anywhere.
    */
  def temperatureResample(df: DataFrame, idCol: String, groupCol: String,
                          alpha: Double, frac: Double,
                          salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    require(frac > 0 && frac <= 1, s"frac out of (0,1]: $frac")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w",
        round(pow(col("__n").cast("double"), alpha), 6).cast("decimal(28,6)"))
    val totals = counts.agg(
      sum(col("__w")).cast("double").as("__wsum"),
      sum(col("__n")).as("__ntot"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(groupCol),
        round(least(lit(1.0),
          col("__ntot").cast("double") * frac / col("__wsum")
            * col("__w").cast("double") / col("__n").cast("double")), 12)
          .as("__q"))
    val u = (hash60(md5(concat(lit(salt), col(idCol).cast("string"))))
      .cast("double") + lit(0.5)) / lit(1152921504606846976.0 /* 2^60 */)
    df.join(broadcast(rates), Seq(groupCol))
      .filter(u < col("__q"))
      .drop("__q")
  }

  /** Target-share resampling (the data-mixing endgame [[temperatureResample]]
    * approximates): given explicit target corpus SHARES per group (a
    * DoReMi-style tuned mixture, or a product decision like "30% code,
    * 60% web, 10% books"), downsample each group deterministically so the
    * kept corpus approaches the target mix. With `budgetFrac` the kept
    * fraction of the corpus (1.0 = as large as the binding group allows):
    * `keep_g = budgetFrac · share_g · n_total / n_g`, clipped to 1 — a
    * group too small to fill its target share keeps everything (its
    * share then undershoots; upsampling is out of scope — duplication is
    * what dedup just removed). Rows in groups without a target share are
    * dropped. Row fate is the [[temperatureResample]] content-hash
    * uniform, so the sample is retry-stable and partitioning-independent.
    *
    * Cross-engine exactness: rates are `round(·, 12)` doubles built from
    * BIGINT counts and literal shares in one pinned shape; the keep test
    * reuses the md5-based `u` every sampler here shares.
    *
    * 100 TB shape: one map-side-combinable group count, scalar total,
    * groups-sized rate table broadcast back, narrow filter — the corpus
    * never shuffles.
    */
  def targetShareResample(df: DataFrame, idCol: String, groupCol: String,
                          shares: Map[String, Double], budgetFrac: Double = 1.0,
                          salt: String = ""): DataFrame = {
    require(shares.nonEmpty, "targetShareResample needs at least one share")
    require(budgetFrac > 0 && budgetFrac <= 1, s"budgetFrac out of (0,1]: $budgetFrac")
    shares.foreach { case (g, s) =>
      require(s > 0 && s <= 1, s"share out of (0,1] for $g: $s") }
    require(shares.values.sum <= 1.0 + 1e-9,
      s"shares sum over 1: ${shares.values.sum}")
    val share = shares.foldLeft(lit(null).cast("double")) {
      case (acc, (k, v)) => when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val totals = counts.agg(sum(col("__n")).as("__ntot"))
    // drop unlisted groups BEFORE the clip: Spark's least() SKIPS nulls
    // (corpusProfile's ADVICE-r8 trap), so least(1.0, null·…) would
    // silently become rate 1.0 instead of "no share → drop"
    val rates = counts.withColumn("__share", share)
      .filter(col("__share").isNotNull)
      .crossJoin(broadcast(totals))
      .select(col(groupCol),
        round(least(lit(1.0),
          lit(budgetFrac) * col("__share") * col("__ntot").cast("double")
            / col("__n").cast("double")), 12).as("__q"))
    val u = (hash60(md5(concat(lit(salt), col(idCol).cast("string"))))
      .cast("double") + lit(0.5)) / lit(1152921504606846976.0 /* 2^60 */)
    df.join(broadcast(rates), Seq(groupCol))
      .filter(u < col("__q"))
      .drop("__q")
  }

  /** Stratified deterministic sampling: a per-stratum keep rate (permille),
    * falling back to `defaultPermille` for unlisted strata — the
    * `sampleBy` twin with content-hash determinism. Used to rebalance a
    * corpus (e.g. downsample the dominant language) reproducibly.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           permilleByStratum: Map[String, Int],
                           defaultPermille: Int, salt: String = ""): DataFrame = {
    (defaultPermille +: permilleByStratum.values.toSeq).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille out of [0,1000]: $p"))
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < rate)
  }

  /** Uniform fixed-size sample WITHOUT replacement per group — the
    * "exactly k docs per language" eval-set cut. The hash of the row id
    * is the row's permanent lottery ticket (the content-hash fate rule:
    * reruns, retries, and engines all agree), and the k SMALLEST
    * tickets per group win — a deterministic "hash reservoir" with no
    * RNG and no per-group window: the k-smallest selection rides the
    * BoundedTopK bounded-heap partial aggregate (negated hash, the q99
    * machinery), so per-group state is k entries and the exchange
    * carries partials, never the group's rows. Output
    * `(group, id, rn)`, rn 1-based in hash order.
    */
  def uniformKPerGroup(df: DataFrame, idCol: String, groupCol: String,
                       k: Int, salt: String = "us"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    // ticket = hash mod 2^50: BoundedTopK scores are doubles, and a
    // 50-bit integer casts to double EXACTLY (a raw 60-bit hash would
    // lose its low bits in the cast and desync from the integer-ordered
    // oracle); collisions within a group are broken by id
    val withTicket = df.select(col(groupCol), col(idCol))
      .withColumn("__negh",
        (-pmod(hash60(md5(concat(lit(salt), col(idCol).cast("string")))),
          lit(1L << 50))).cast("double"))
    graft.operators.Selection.topKPerGroup(withTicket, groupCol, "__negh", idCol, k)
      .select(col(groupCol), col(idCol), col("rn"))
  }

  /** Frequency-proportional negative sampling — the word2vec training
    * primitive: for every row, `k` deterministic draws from the corpus
    * unigram distribution (each token's probability = its corpus count /
    * total tokens). Output `(id, j, token)`, `j` in `0..k-1`.
    *
    * Everything is INTEGER-exact, so any engine stating the rule draws
    * the identical tokens: the vocabulary is laid out on `[0, W)` (W =
    * total token count) as count-width intervals in `(hash-bucket,
    * token)` order; draw `u = md5-hash(id:j:salt) mod W` selects the
    * covering interval. (word2vec's count^0.75 flattening is a float
    * weight — the integer-exact contract here is the plain-count
    * distribution; flatten upstream by capping counts if needed.)
    *
    * 100 TB shape: one corpus pass for the vocab counts (map-side
    * combinable). The CDF needs a GLOBAL prefix sum over the vocab —
    * computed two-level (per-hash-bucket sums → 1000-row broadcast
    * offsets → within-bucket window), never a single-partition window
    * over the full vocabulary. Draw→interval matching is a BUCKETIZED
    * range join (the [[graft.operators.Intervals]] pattern on integer
    * keys): `[0, W)` splits into ~4096 equi-width buckets, draws equi-
    * join their bucket, intervals explode over the buckets they span —
    * total explode ≈ vocab + 4096, and a mega-frequent token spanning
    * many buckets still meets each draw exactly once.
    */
  def negativeSamples(df: DataFrame, idCol: String, textCol: String,
                      k: Int, salt: String = "ns"): DataFrame = {
    require(k >= 1 && k <= 1000, s"k out of [1,1000]: $k")
    val vocab = df.select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("__cnt"))
      .withColumn("__b", hashBucket(col("token"), salt))
    // two-level global prefix sum in (__b, token) order
    val bucketSums = vocab.groupBy("__b").agg(sum(col("__cnt")).as("__bs"))
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bucketSums // ≤1000 rows: the offset window is tiny
      .withColumn("__off", coalesce(sum(col("__bs")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    val wIn = org.apache.spark.sql.expressions.Window.partitionBy(col("__b"))
      .orderBy(col("token"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cdf = vocab.join(broadcast(offsets), Seq("__b"))
      .withColumn("__lo",
        col("__off") + coalesce(sum(col("__cnt")).over(wIn), lit(0L)))
      .select(col("token"), col("__lo"), (col("__lo") + col("__cnt")).as("__hi"))
    val total = vocab.agg(sum(col("__cnt")).as("__w"))
      .select(col("__w"),
        greatest(expr("__w div 4096"), lit(1L)).as("__bw"))
    // bucketized integer range join: ~4096 equi-width u-buckets; an
    // interval explodes over every bucket it spans
    val iv = cdf.crossJoin(broadcast(total))
      .select(col("token"), col("__lo"), col("__hi"),
        explode(sequence(expr("__lo div __bw"),
          expr("(__hi - 1) div __bw"))).as("__ub"))
    val drawn = df.select(col(idCol).as("id"),
      explode(sequence(lit(0), lit(k - 1))).as("j"))
      .crossJoin(broadcast(total))
      .withColumn("__u", pmod(hash60(md5(concat(col("id").cast("string"),
        lit(":"), col("j").cast("string"), lit(":"), lit(salt)))), col("__w")))
      .withColumn("__ub", expr("__u div __bw"))
    drawn.join(iv, Seq("__ub"))
      .filter(col("__u") >= col("__lo") && col("__u") < col("__hi"))
      .select(col("id").as(idCol), col("j"), col("token"))
  }

  /** Poisson(1) bootstrap weight for a (replicate, row) pair — the
    * classic distributed-bootstrap device (resampling n rows with
    * replacement ≈ giving each row an independent Poisson(1) count, no
    * global coordination needed). The weight is a PURE FUNCTION of
    * (salt, replicate, id): u = hash mod 10⁶ uniform on the micro grid,
    * inverted through the Poisson(1) CDF as a literal 6-threshold CASE
    * (P(X ≥ 7) < 10⁻⁵ — truncation is below the grid's own resolution).
    * Identical thresholds in the DuckDB twin → identical weights.
    */
  def poissonWeight(idCol: Column, replicate: Column, salt: String): Column = {
    val u = pmod(hash60(md5(concat(lit(salt), replicate.cast("string"),
      lit(":"), idCol.cast("string")))), lit(1000000L))
    when(u < 367879, 0L).when(u < 735759, 1L).when(u < 919699, 2L)
      .when(u < 981012, 3L).when(u < 996340, 4L).when(u < 999406, 5L)
      .otherwise(6L)
  }

  /** Poisson-bootstrap confidence interval for the corpus mean of
    * `valueCol`: `replicates` deterministic resamples, each a weighted
    * mean under [[poissonWeight]], then the (loQ, hiQ) quantiles of the
    * replicate means — "is the corpus-mean difference between two
    * pipelines real or noise", the eval-report primitive behind every
    * quality-score dashboard delta.
    *
    * Output: ONE row `(n, mean_full, n_replicates, boot_mean, boot_lo,
    * boot_hi)` (6 dp). Values quantize at 9 dp into DECIMAL(28,12) sums
    * (the q71 rule) so every replicate mean is order-independent.
    *
    * 100 TB shape: the replicate explode is NARROW (each input row emits
    * `replicates` lightweight (b, w·v) pairs that partially aggregate
    * IN THE SAME TASK before any exchange — the shuffle carries
    * partitions × replicates partial rows, never the corpus ×B blowup),
    * and the quantile runs on the `replicates`-row table. The per-row
    * cost is `replicates` md5 evaluations: size `replicates` to the
    * report's precision need (default 200), not to the corpus.
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
                      replicates: Int = 200, loQ: Double = 0.025,
                      hiQ: Double = 0.975, salt: String = "boot"): DataFrame = {
    require(replicates >= 10 && replicates <= 10000,
      s"replicates out of [10,10000]: $replicates")
    require(loQ > 0 && hiQ < 1 && loQ < hiQ, s"bad quantiles ($loQ, $hiQ)")
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"),
        round(col(valueCol), 9).cast("decimal(28,12)").as("__v"))
    val full = rows.agg(count(lit(1)).as("n"),
      sum(col("__v")).as("__sv"))
    val reps = rows
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
      .withColumn("__w", poissonWeight(col("__id"), col("__b"), salt))
      .groupBy("__b")
      .agg(sum(col("__w") * col("__v")).as("__ws"), sum(col("__w")).as("__wn"))
      .filter(col("__wn") > 0)
      .select((col("__ws").cast("double") / col("__wn").cast("double")).as("__m"))
    val ci = reps.agg(count(lit(1)).as("n_replicates"),
      sum(round(col("__m"), 9).cast("decimal(28,12)")).as("__bs"),
      round(percentile(col("__m"), lit(loQ)), 6).as("boot_lo"),
      round(percentile(col("__m"), lit(hiQ)), 6).as("boot_hi"))
      .select(col("n_replicates"),
        round(col("__bs").cast("double") / col("n_replicates").cast("double"), 6)
          .as("boot_mean"),
        col("boot_lo"), col("boot_hi"))
    full.select(col("n"),
        round(col("__sv").cast("double") / col("n").cast("double"), 6)
          .as("mean_full"))
      .crossJoin(broadcast(ci))
  }

  /** Per-group [[bootstrapMeanCI]] — one CI row PER `groupCol` value
    * ("is source A's quality mean really above source B's, or is the
    * difference inside the slices' noise"). Same deterministic
    * [[poissonWeight]] tickets (a row's weight depends only on
    * (salt, replicate, id) — group membership never perturbs another
    * group's draw), same 9-dp decimal quantization.
    *
    * Output per group: `(group, n, mean_full, n_replicates, boot_mean,
    * boot_lo, boot_hi)`; a group whose replicates all drew weight 0
    * (only possible for tiny groups) keeps its mean with NULL CI columns.
    *
    * 100 TB shape: the explode partially aggregates per (group,
    * replicate) in-task — the exchange carries partitions × groups × B
    * partial rows; the quantile runs per group on its B-row means table,
    * and the final join is groups-sized.
    */
  def bootstrapMeanCIByGroup(df: DataFrame, idCol: String, valueCol: String,
                             groupCol: String, replicates: Int = 200,
                             loQ: Double = 0.025, hiQ: Double = 0.975,
                             salt: String = "boot"): DataFrame = {
    require(replicates >= 10 && replicates <= 10000,
      s"replicates out of [10,10000]: $replicates")
    require(loQ > 0 && hiQ < 1 && loQ < hiQ, s"bad quantiles ($loQ, $hiQ)")
    val rows = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        round(col(valueCol), 9).cast("decimal(28,12)").as("__v"))
    val full = rows.groupBy("__g")
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__sv"))
    val reps = rows
      .select(col("__g"), col("__id"), col("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
      .withColumn("__w", poissonWeight(col("__id"), col("__b"), salt))
      .groupBy("__g", "__b")
      .agg(sum(col("__w") * col("__v")).as("__ws"), sum(col("__w")).as("__wn"))
      .filter(col("__wn") > 0)
      .select(col("__g"),
        (col("__ws").cast("double") / col("__wn").cast("double")).as("__m"))
    val ci = reps.groupBy("__g")
      .agg(count(lit(1)).as("n_replicates"),
        sum(round(col("__m"), 9).cast("decimal(28,12)")).as("__bs"),
        round(percentile(col("__m"), lit(loQ)), 6).as("boot_lo"),
        round(percentile(col("__m"), lit(hiQ)), 6).as("boot_hi"))
    full.join(ci, Seq("__g"), "left")
      .select(col("__g").as("group"), col("n"),
        round(col("__sv").cast("double") / col("n").cast("double"), 6)
          .as("mean_full"),
        col("n_replicates"),
        round(col("__bs").cast("double") / col("n_replicates").cast("double"), 6)
          .as("boot_mean"),
        col("boot_lo"), col("boot_hi"))
  }

  /** Mixture allocation under finite supply — the WATER-FILLING planner
    * behind "mix these sources at weights w under a total budget B":
    * every group gets `min(supply, λ·w)` rows with one global level λ
    * chosen so the total spends exactly `min(B, Σsupply)`. Groups too
    * small for their weight saturate (contribute all they have); the
    * shortfall redistributes to the rest — the step [[
    * targetShareResample]] (fixed per-group rates, no redistribution)
    * deliberately does not take. Input is the PRE-AGGREGATED groups
    * relation `(groupCol, supplyCol, weightCol)` with integer supplies
    * and integer weights (parts-per-whatever — only ratios matter);
    * output `(group, supply, weight, allocation)` with allocation a
    * 6-dp double (exact integers for saturated groups).
    *
    * Cross-engine exactness: the saturated set is a PREFIX of the
    * supply/weight-ratio order (the water-filling property), located by
    * the integer condition `supply_i · W_rem_{i−1} ≤ (B − S_{i−1}) ·
    * w_i` in DECIMAL(38,0) cross-products — the exact decisions never
    * divide. The sort key is the single IEEE double `supply / weight`
    * (ties by group): both engines compute the identical bits, so the
    * ordering is engine-exact without decimal-division scale traps.
    *
    * 100 TB shape: the operator runs entirely on the groups-sized
    * relation (the corpus pass producing supplies happens upstream);
    * windows span ≤ |groups| rows.
    */
  def mixtureAllocation(groups: DataFrame, groupCol: String,
                        supplyCol: String, weightCol: String,
                        budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .orderBy(col("__key"), col(groupCol))
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val keyed = groups.select(col(groupCol),
      col(supplyCol).cast("long").as("supply"),
      col(weightCol).cast("long").as("weight"))
      .filter(col("supply").isNotNull && col("weight") > 0)
      // ORDERING key only (the exact saturation decisions never divide):
      // one IEEE division of exact longs — bit-identical in any engine
      .withColumn("__key",
        col("supply").cast("double") / col("weight").cast("double"))
    val cum = keyed
      .withColumn("__s", sum(col("supply")).over(wCum))   // S_i inclusive
      .withColumn("__ws", sum(col("weight")).over(wCum))  // ΣW_i inclusive
      .withColumn("__wt", sum(col("weight")).over(wAll))
      // saturation test against the PRE-i state: S_{i−1}, W_rem_{i−1}
      .withColumn("__c",
        when(d38(col("supply")) * (d38(col("__wt")) - d38(col("__ws")) + d38(col("weight")))
          <= (d38(lit(budget)) - (d38(col("__s")) - d38(col("supply")))) * d38(col("weight")),
          1).otherwise(0))
      // water-filling: the saturated set is a prefix — cut at the first 0
      .withColumn("__sat", min(col("__c")).over(wCum))
    val cut = cum.agg(
      coalesce(sum(when(col("__sat") === 1, col("supply"))), lit(0L)).as("__ss"),
      coalesce(sum(when(col("__sat") === 1, col("weight"))), lit(0L)).as("__sw"))
    cum.crossJoin(broadcast(cut))
      .select(col(groupCol), col("supply"), col("weight"),
        when(col("__sat") === 1, round(col("supply").cast("double"), 6))
          .otherwise(round(
            (d38(lit(budget)) - d38(col("__ss"))).cast("double") * col("weight").cast("double")
              / (d38(col("__wt")) - d38(col("__sw"))).cast("double"), 6))
          .as("allocation"))
  }
}
