package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Rounding.zround

/** Column-level data profiling — the "describe my table" pass every
  * ingestion pipeline runs before trusting a new feed (reference scope:
  * the engine side of TODO.md's data-quality ambitions; no direct
  * reference twin — this is large-pipeline tooling, like the dedup
  * family).
  *
  * One corpus pass produces one row per profiled column:
  * `(column, n_rows, n_null, null_frac, n_distinct, min_value,
  * max_value)` with min/max in the column's STRING form (binary UTF-8
  * ordering — identical across engines for string and integer columns;
  * float columns profile fine but their rendered form is
  * engine-specific, so cross-engine oracles should stick to
  * string/integer columns).
  */
object Profiling {

  /** Profile `cols` of `df` in ONE aggregation pass.
    *
    * `exact = true` (the oracle arm) uses `count(DISTINCT c)` per
    * column: Spark plans the multi-distinct aggregate via Expand — the
    * corpus is replicated once per distinct-agg into a single shuffle,
    * exact but ~|cols|× the map-side volume. `exact = false` swaps in
    * `approx_count_distinct` (HLL++, `rsd` relative error, default 5%):
    * fixed-size sketches, no Expand, one clean map-side-combinable pass
    * — the 100 TB arm, same plan shape otherwise ([[
    * graft.engine.Summaries]] quantile-family precedent).
    *
    * The per-column rollup is a `stack` unpivot of the ONE aggregate
    * row — column-count-sized, never a per-column corpus pass (a
    * `cols.map(df.agg(...))` loop would scan the corpus |cols| times).
    */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     exact: Boolean = true, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "column names with quotes/backticks are not supported")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__cnt_$c`, `__nd_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    row.select(col("__n"),
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column, __present, n_distinct, min_value, max_value)"))
      .select(col("column"), col("__n").as("n_rows"),
        (col("__n") - col("__present")).as("n_null"),
        round((col("__n") - col("__present")) / col("__n").cast("double"), 6)
          .as("null_frac"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Benford first-digit profile of a positive numeric column — the
    * fabricated-data / unit-mixup canary for warehouse columns (organic
    * multiplicative quantities follow `P(d) = log10(1+1/d)`; a flat or
    * spiked profile flags synthetic rows, a wrong-unit feed, or a
    * truncated extract): per digit 1–9, the observed count, observed
    * share, Benford expectation, and signed deviation.
    *
    * Determinism: the digit comes from `substring(cast(floor(x) AS
    * BIGINT) AS string), 1, 1)` — floor is IEEE-identical everywhere and
    * integer→string has no format ambiguity (a direct double→int cast
    * would diverge: Spark truncates, DuckDB rounds). Rows with x < 1 are
    * excluded (their first significant digit sits in the fraction).
    * Expectation and deviation round at 6 dp, parsecs away from any
    * half-up/half-even boundary.
    *
    * 100 TB shape: one map-side-combinable 9-bucket count plus a
    * broadcast scalar total — a single corpus pass, constant-size state.
    */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    // the total derives from the 9-row count table — truly one pass
    val total = counts.agg(sum(col("n")).as("__nn"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("__nn").cast("double"))
      .withColumn("expected", round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("deviation", zround(col("share") - col("expected"), 6))
      .select("digit", "n", "share", "expected", "deviation")
  }

  /** Referential-integrity fanout audit between a parent and child
    * relation — `(k, n_parents)` where row k ≥ 0 counts parents with
    * exactly k child rows (k = 0 surfaces childless parents, invisible
    * to any inner-join report) and the sentinel row k = −1 counts
    * ORPHAN child rows whose key matches no parent (always emitted, 0
    * when clean). The load-shape + broken-FK canary run after every
    * ingest: a fanout histogram that suddenly grows a tail means
    * duplicated children; a non-zero orphan row means the feed shipped
    * children before (or without) their parents.
    *
    * NULL keys follow equi-join semantics on BOTH sides: a NULL child
    * key never matches any parent, so its rows count as orphans; a
    * NULL-keyed parent matches no children, so it counts at k = 0 (the
    * q178 oracle states the orphan side as an anti-join, not `NOT IN`,
    * precisely so one NULL cannot poison the predicate — spec-pinned).
    *
    * 100 TB shape: the child never joins row-level — one
    * map-side-combinable count per foreign key, then a keys-sized left
    * join onto the parent keys and a second tiny histogram aggregation;
    * the orphan row is a keys-sized anti-join summed to one value.
    */
  def fanoutAudit(parent: DataFrame, child: DataFrame,
                  parentKey: String, childKey: String): DataFrame = {
    val perKey = child.groupBy(col(childKey).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val pk = parent.select(col(parentKey).as("__k"))
    val fan = pk.join(perKey, Seq("__k"), "left")
      .select(coalesce(col("__c"), lit(0L)).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_parents"))
    val orphans = perKey.join(pk, Seq("__k"), "left_anti")
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_parents"))
      .select(lit(-1L).as("k"), col("n_parents"))
    fan.unionByName(orphans)
  }

  /** Embedding-table quality audit per label: `(label, n, n_null,
    * n_bad, n_zero, dim_min, dim_max, min_norm, max_norm, mean_norm)` —
    * the canary a vector pipeline runs after every re-embed (a feed
    * that started shipping zero vectors, NaNs from an fp16 overflow, or
    * a dimension change silently poisons every ANN/centroid operator
    * downstream). `n_bad` counts non-null vectors carrying a NaN OR a
    * null element (both poison downstream kernels the same way). Norm
    * stats cover CLEAN rows only (non-null, bad-element-free); the
    * defect counters cover everything.
    *
    * Determinism: per-row norms round to 6 dp (`sqrt` of the fold —
    * the q71 transcendental rule), the mean decimal-sums those rounded
    * norms — order-independent, engine-identical.
    *
    * 100 TB shape: ONE map-side-combinable aggregation; per-row
    * kernels only, nothing but the (labels × 10) result ever shuffles.
    */
  def embeddingAudit(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val hasNan = exists(v, x => x.isNull || isnan(x.cast("double")))
    val clean = v.isNotNull && !hasNan
    val norm2 = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nrm = round(sqrt(norm2), 6)
    val one = lit(1L)
    val zero = lit(0L)
    df.groupBy(col(labelCol).as("label")).agg(
      count(lit(1)).as("n"),
      sum(when(v.isNull, one).otherwise(zero)).as("n_null"),
      sum(when(v.isNotNull && hasNan, one).otherwise(zero)).as("n_bad"),
      sum(when(clean && forall(v, x => x.cast("double") === 0.0), one)
        .otherwise(zero)).as("n_zero"),
      min(when(clean, size(v))).as("dim_min"),
      max(when(clean, size(v))).as("dim_max"),
      min(when(clean, nrm)).as("min_norm"),
      max(when(clean, nrm)).as("max_norm"),
      round(sum(when(clean, nrm.cast("decimal(28,12)"))).cast("double")
        / sum(when(clean, one).otherwise(zero)).cast("double"), 6).as("mean_norm"))
  }

  /** Functional-dependency discovery over a candidate column set: for
    * every ordered pair `(a, b)`, does `a → b` hold (every `a` value maps
    * to exactly one `b` value)? The schema-inference pass a pipeline runs
    * on a new feed to find join keys and denormalized columns —
    * `violations = Σ_groups (distinct b − 1)` counts the rows of evidence
    * against the dependency, `holds` iff zero. NULL is treated as a
    * value on both sides (two NULLs agree), the SQL `GROUP BY` reading —
    * stated in the oracle twin too.
    *
    * 100 TB shape: one pass PER PAIR, but each pass reads exactly two
    * columns (parquet column pruning) and is a distinct-pair reduction —
    * `select(a,b).distinct` (map-side combinable) then an `a`-sized
    * aggregation. Pair passes are independent; the union is lazy, so
    * Spark schedules them concurrently. Candidate sets are small by
    * meaning (the columns a human suspects) — this is |cols|² scans of
    * a 2-column projection, not of the table.
    */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "functionalDeps needs at least two columns")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val pairs = for (a <- cols; b <- cols if a != b) yield {
      df.select(col(a).as("__a"), col(b).as("__b")).distinct()
        .groupBy(col("__a")).agg(count(lit(1)).as("__nb"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("__nb") - 1).as("violations"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"),
          col("n_groups"), col("violations"),
          (col("violations") === 0L).as("holds"))
    }
    pairs.reduce(_.unionByName(_))
  }

  /** Count-min sketch AS A RELATION: `(seed, bucket, cnt)`, depth rows ×
    * width buckets, `bucket = md5-hash(seed : item) mod width`. The
    * OTHER frequency sketch next to [[graft.functions.HeavyHittersOps]]:
    * Misra–Gries keeps the top keys and forgets the tail; count-min
    * answers point queries about ANY key, always over-estimating
    * (`est ≥ true`, error ≤ 2n/width with prob 1 − 2^−depth). Because
    * the sketch is pure bucket SUMS it is order- and partition-
    * independent — unlike an undercapacity MG sketch — so the whole
    * construction is exactly reproducible by any engine stating the
    * hash, which is how the oracle twin pins it.
    *
    * 100 TB shape: explode items × `depth` seeds (narrow, ×depth
    * volume), then ONE map-side-combinable count into at most
    * `depth·width` cells — the exchange carries the CELL table, never
    * the key universe. Estimates ([[countMinEstimate]]) hash the probes
    * the same way and take `min` over depth cells; the sketch side of
    * that join is at most `depth·width` rows — broadcastable.
    */
  def countMinSketch(df: DataFrame, itemCol: String,
                     depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    df.select(col(itemCol).cast("string").as("__item"))
      .filter(col("__item").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("seed"), col("__item"))
      .select(col("seed"),
        pmod(graft.operators.Sampling.hash60(
          md5(concat(col("seed").cast("string"), lit(":"), col("__item")))),
          lit(width.toLong)).as("bucket"))
      .groupBy(col("seed"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMinSketch]] relation: for each probe
    * item, `est = min over seeds of its cell count` (absent cell = 0).
    * Output `(item, est)`. The sketch side is ≤ depth·width rows —
    * broadcast it.
    */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
                       depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    probes.select(col(itemCol).cast("string").as("item")).distinct()
      .filter(col("item").isNotNull)
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .select(col("item"), col("seed"),
        pmod(graft.operators.Sampling.hash60(
          md5(concat(col("seed").cast("string"), lit(":"), col("item")))),
          lit(width.toLong)).as("bucket"))
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .select(col("item").as(itemCol), col("est"))
  }

  /** HyperLogLog sketch AS A RELATION (the third classic sketch next to
    * Misra–Gries and count-min, here fully ORACLE-CHECKABLE — unlike
    * `approx_count_distinct`'s opaque engine sketch): one row per
    * occupied register, `(reg, max_rho)`, where the 60-bit md5 hash
    * splits into `reg = h mod m` and a `(60 − log2 m)`-bit tail whose
    * leading-zero count (+1) is rho — computed INTEGER-exactly as
    * `budget + 1 − length(bin(tail))` (bin() drops leading zeros in
    * both engines; tail 0 → budget + 1).
    *
    * 100 TB shape: a narrow per-row kernel + ONE map-side-combinable
    * `max` into ≤ m rows — the exchange is register-sized no matter the
    * key universe, and sketches of corpus shards union by the same
    * `max` (mergeable-summaries).
    */
  def hllSketch(df: DataFrame, itemCol: String, m: Int): DataFrame = {
    require(m >= 16 && m <= 65536 && (m & (m - 1)) == 0,
      s"m must be a power of two in [16,65536]: $m")
    val budget = 60 - Integer.numberOfTrailingZeros(m)
    df.filter(col(itemCol).isNotNull)
      .select(graft.operators.Sampling.hash60(
        md5(concat(lit("hll"), col(itemCol).cast("string")))).as("__h"))
      .select(pmod(col("__h"), lit(m.toLong)).as("reg"),
        expr(s"__h div ${m}L").as("__tail"))
      .select(col("reg"),
        when(col("__tail") === 0L, lit(budget + 1))
          .otherwise(lit(budget + 1) - length(bin(col("__tail")))).as("__rho"))
      .groupBy("reg").agg(max(col("__rho")).as("max_rho"))
  }

  /** Bloom filter AS A RELATION — the fourth classic sketch next to
    * Misra–Gries/count-min/HLL, and the oracle-checkable twin of the
    * engine-opaque `bloom_filter_agg` the q87 decontamination path uses:
    * `bits` filter bits packed 32-per-word into `(word, bits)` rows
    * (32, not 64: engines that CHECK shift overflow reject `1 << 63`
    * on a signed 64-bit lane; 32-bit packing keeps every mask positive
    * everywhere),
    * built by a `bit_or` aggregation (order- and partition-independent,
    * mergeable across shards by the same `bit_or`). `hashes` md5-derived
    * positions per item.
    *
    * 100 TB shape: a narrow per-row kernel (×hashes) + ONE map-side-
    * combinable aggregation into ≤ bits/32 rows; probes join the
    * broadcast word table ([[bloomMaybeContains]]) — no-false-negative
    * membership with the standard fp rate `(1 − e^{−dn/m})^d`.
    */
  def bloomSketch(df: DataFrame, itemCol: String, bits: Int,
                  hashes: Int): DataFrame = {
    require(bits >= 64 && bits <= (1 << 26) && (bits & (bits - 1)) == 0,
      s"bits must be a power of two in [64, 2^26]: $bits")
    require(hashes >= 1 && hashes <= 16, s"hashes out of [1,16]: $hashes")
    df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("__item"))
      .select(explode(sequence(lit(0), lit(hashes - 1))).as("__seed"), col("__item"))
      .select(pmod(graft.operators.Sampling.hash60(
        md5(concat(col("__seed").cast("string"), lit(":"), col("__item")))),
        lit(bits.toLong)).as("__pos"))
      .select(expr("__pos div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))").as("__mask"))
      .groupBy(col("word")).agg(expr("bit_or(__mask)").as("bits"))
  }

  /** Membership probes against a [[bloomSketch]] relation: `(item,
    * maybe_present)` — false ⇒ definitely absent; true ⇒ present or a
    * false positive. The word table broadcasts (≤ bits/32 rows).
    */
  def bloomMaybeContains(sketch: DataFrame, probes: DataFrame, itemCol: String,
                         bits: Int, hashes: Int): DataFrame = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, s"bits must be a power of two: $bits")
    require(hashes >= 1 && hashes <= 16, s"hashes out of [1,16]: $hashes")
    probes.select(col(itemCol).cast("string").as("item")).distinct()
      .filter(col("item").isNotNull)
      .select(col("item"), explode(sequence(lit(0), lit(hashes - 1))).as("__seed"))
      .select(col("item"), pmod(graft.operators.Sampling.hash60(
        md5(concat(col("__seed").cast("string"), lit(":"), col("item")))),
        lit(bits.toLong)).as("__pos"))
      .select(col("item"), expr("__pos div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))").as("__mask"))
      .join(broadcast(sketch), Seq("word"), "left")
      .groupBy(col("item"))
      .agg(min(when(col("bits").isNotNull
        && (col("bits").bitwiseAND(col("__mask")) =!= 0L), 1).otherwise(0)).as("__all"))
      .select(col("item").as(itemCol), (col("__all") === 1).as("maybe_present"))
  }

  /** The HLL estimate from a [[hllSketch]] relation — one row:
    * `(m, n_zero_regs, est_raw, est)`. The harmonic sum is EXACT:
    * `Σ 2^(60 − rho)` over all m registers (empty = 2^60) as
    * DECIMAL(38,0), so `est_raw = α·m²·2^60 / S` is one IEEE division
    * of exactly-agreed operands. `est` applies the standard small-range
    * correction (`m·ln(m / zeros)` when zeros > 0 and est_raw ≤ 2.5m),
    * rounded 4 dp — the one transcendental, quantized coarsely enough
    * to absorb engine ulp.
    */
  def hllEstimate(sketch: DataFrame, m: Int): DataFrame = {
    require(m >= 16 && m <= 65536 && (m & (m - 1)) == 0,
      s"m must be a power of two in [16,65536]: $m")
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val spark = sketch.sparkSession
    val regs = spark.range(m).select(col("id").cast("long").as("reg"))
    val full = regs.join(broadcast(sketch), Seq("reg"), "left")
      .select(coalesce(col("max_rho"), lit(0)).as("__rho"))
    val agg = full.agg(
      sum(when(col("__rho") === 0, 1L).otherwise(0L)).as("n_zero_regs"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), 60 - __rho)").cast("decimal(38,0)"))
        .as("__s"))
    agg.select(lit(m).as("m"), col("n_zero_regs"),
      round((lit(alpha) * m * m * math.pow(2.0, 60))
        / col("__s").cast("double"), 4).as("est_raw"))
      .select(col("m"), col("n_zero_regs"), col("est_raw"),
        when(col("n_zero_regs") > 0 && col("est_raw") <= lit(2.5 * m),
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_regs").cast("double")), 4))
          .otherwise(col("est_raw")).as("est"))
  }

  /** Bottom-k rank sample AS A RELATION — the FIFTH classic mergeable
    * sketch next to Misra–Gries (frequency), count-min (counts), HLL
    * (distinct), and Bloom (membership): a deterministic uniform row
    * sample for QUANTILE estimation. Each row draws a 50-bit md5 ticket
    * from its id; the sketch is the k rows with the SMALLEST tickets,
    * `(rn, ticket, value)` — membership is a pure function of the row
    * (retry/partitioning-stable), and the merge is closed-form:
    * bottom-k of a union IS the bottom-k of the unioned sketches
    * (re-run [[rankSampleSketch]]'s heap over the concatenation — the
    * spec pins `sketch(A ∪ B) ≡ merge(sketch(A), sketch(B))`).
    *
    * Unlike `approx_percentile`'s opaque engine sketch, every row here
    * is ORACLE-CHECKABLE: the twin is `ORDER BY ticket, value LIMIT k`.
    * Standard bottom-k error: quantiles off the k-sample hold
    * ±O(1/√k) rank error with high probability.
    *
    * 100 TB shape: ONE corpus pass through the bounded-heap aggregate
    * ([[graft.functions.TopKOps]]) — each task keeps k entries, the
    * exchange carries partitions × k rows, the final merge is a heap
    * fold. Nothing corpus-sized moves.
    */
  def rankSampleSketch(df: DataFrame, idCol: String, valueCol: String,
                       k: Int, salt: String = "rs"): DataFrame = {
    require(k >= 8 && k <= 100000, s"k out of [8,100000]: $k")
    // ticket ∈ [0, 2^50): exactly representable as double, so the heap's
    // (score desc, id asc) order on −ticket is the exact (ticket asc,
    // value asc) order the oracle states
    val ticket = pmod(graft.operators.Sampling.hash60(
      md5(concat(lit(salt), col(idCol).cast("string")))), lit(1L << 50))
    df.filter(col(valueCol).isNotNull)
      .select(ticket.as("__t"), col(valueCol).cast("long").as("__v"))
      .agg(graft.functions.TopKOps.topK(k, -col("__t").cast("double"), col("__v"))
        .as("__top"))
      .select(posexplode(col("__top")))
      .select((col("pos") + 1).cast("long").as("rn"),
        (-col("col.score")).cast("long").as("ticket"),
        col("col.id").as("value"))
  }

  /** Quantile estimates off a [[rankSampleSketch]] relation: exact
    * percentile over the ≤k sampled values — one row per requested p,
    * `(p, est)`. The sketch is the scale device; this is sketch-sized
    * math.
    */
  def rankSampleQuantiles(sketch: DataFrame, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1), s"bad quantiles: $ps")
    val agg = sketch.agg(
      percentile(col("value"), array(ps.map(lit): _*)).as("__q"))
    agg.select(posexplode(col("__q")))
      .select(element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
        round(col("col"), 6).as("est"))
  }

  /** Declarative data-quality expectations (the great-expectations-style
    * gate an ingestion pipeline runs before promoting a feed). Each rule
    * is a typed constraint; the report is one row per rule:
    * `(rule, n_rows, n_violations, violation_frac)`.
    */
  sealed trait Expectation { def label: String }
  /** Column must never be NULL. */
  final case class ExpectNotNull(column: String) extends Expectation {
    val label = s"not_null($column)"
  }
  /** Non-null values must be unique (violations = non-null rows minus
    * distinct non-null values — each extra copy counts once).
    */
  final case class ExpectUnique(column: String) extends Expectation {
    val label = s"unique($column)"
  }
  /** Non-null values must sit in [lo, hi] (inclusive). */
  final case class ExpectInRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    val label = s"in_range($column,$lo,$hi)"
  }
  /** Non-null values must be one of `values`. */
  final case class ExpectInSet(column: String, values: Seq[String])
      extends Expectation {
    require(values.nonEmpty, s"empty allowed set for $column")
    val label = s"in_set($column)"
  }
  /** Non-null values must fully match `pattern` (anchored rlike). */
  final case class ExpectMatches(column: String, pattern: String)
      extends Expectation {
    val label = s"matches($column)"
  }

  /** Evaluate every expectation in ONE corpus pass: each rule compiles
    * to a conditional-count aggregate ([[ExpectUnique]] adds a
    * `count_distinct`, planned through the same Expand as
    * [[profileColumns]]' exact arm), and the per-rule rollup is a
    * `stack` unpivot of the single aggregate row — rules-count-sized,
    * never a per-rule corpus pass.
    *
    * 100 TB shape: one map-side-combinable aggregation (plus one Expand
    * replication per distinct-count rule — drop [[ExpectUnique]] rules
    * or pre-dedup if that matters at the extreme); nothing else touches
    * the corpus.
    */
  def expectationReport(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expectationReport needs at least one rule")
    require(rules.map(_.label).distinct.size == rules.size,
      s"duplicate rule labels: ${rules.map(_.label).mkString(", ")}")
    rules.foreach {
      case e: ExpectInRange => require(e.lo <= e.hi, s"bad range in ${e.label}")
      case _ => ()
    }
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      (r match {
        case ExpectNotNull(c) =>
          sum(when(col(c).isNull, 1L).otherwise(0L))
        case ExpectUnique(c) =>
          count(col(c)) - count_distinct(col(c))
        case ExpectInRange(c, lo, hi) =>
          sum(when(col(c).isNotNull &&
            (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))
        case ExpectInSet(c, vs) =>
          sum(when(col(c).isNotNull && !col(c).isInCollection(vs), 1L)
            .otherwise(0L))
        case ExpectMatches(c, p) =>
          sum(when(col(c).isNotNull && !col(c).rlike(s"^(?:$p)$$"), 1L)
            .otherwise(0L))
      }).cast("long").as(s"__v_$i")
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot as explode-of-structs, NOT a string-built stack(...) expr:
    // rule labels embed raw column names, and interpolating them into
    // SQL text would let a quoted column name break (or inject into)
    // the query — lit() carries any label verbatim
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.label).as("rule"), col(s"__v_$i").as("n_violations"))
    }
    row.select(col("__n").as("n_rows"),
      explode(array(entries: _*)).as("__e"))
      .select(col("__e.rule").as("rule"), col("n_rows"),
        col("__e.n_violations").as("n_violations"),
        round(col("__e.n_violations").cast("double") / col("n_rows").cast("double"), 6)
          .as("violation_frac"))
  }
}
