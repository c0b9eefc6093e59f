package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Changes, Sql, Summaries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry exercises one operator family from SURVEY.md §2 on the harness
  * tables; each has a DuckDB oracle twin in [[oracleSql]] with identical
  * column names and a total deterministic ORDER BY.
  *
  * Cross-engine determinism rules used throughout (so value hashes match):
  *   - money/price aggregates go through DECIMAL(18,2) (exact) and cast back
  *     to DOUBLE — double-sum ordering differences can never show up;
  *   - raw double columns pass through untouched (bit-exact from parquet);
  *   - derived doubles use the same IEEE expression shape on both sides;
  *   - integer outputs are BIGINT on both sides;
  *   - every query ends in a total ORDER BY over a unique key.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read nanos as long and floor-convert to a microsecond
    * timestamp (matching DuckDB's ns→us handling of the same file).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_changed_values")(spark, "/root/testdata/sf0.001")

  // money-exact sum: DECIMAL(18,2) accumulate, DOUBLE out
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── W1/W2/F5: the flagship — partitioned-lag change detection
    // (quantization). Reference client.py:453-475 re-expressed as one window
    // over the full scan (SURVEY.md §3.1).
    "q01_changed_values" -> ((s, dir) => {
      Changes.changedRows(events(s, dir), "user_id", Seq("ts", "event_id"), "value")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    }),

    // ── §2.5 aggregation: TPC-H Q1-shaped pricing summary.
    "q02_pricing_summary" -> ((s, dir) => {
      val one = lit(1).cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (one - col("l_discount").cast("decimal(18,2)"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ── F1/F3/F4 + P1 + O1: range predicates pushed to the scan, canonical
    // projection, compound deterministic order.
    "q03_filter_range" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_quantity").between(10, 40) &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.08)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ── F2/C8: regex membership semantics (reference's rlike CVE filter,
    // client.py:276).
    "q04_rlike_filter" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_type").rlike("ECONOMY|LARGE"))
        .select("p_partkey", "p_type", "p_brand")
        .orderBy("p_partkey")
    }),

    // ── §2.6 ranking window: top-3 orders per customer.
    "q05_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // ── §2.4 join: broadcast dim join + aggregation.
    "q06_join_broadcast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // ── Q1/Q2 SQL surface: 3-way join through the full Catalyst SQL
    // lifecycle (identical SQL text runs on the DuckDB side).
    "q07_sql_3way_join" -> ((s, dir) => {
      Sql.registerDir(s, dir, Seq("customer", "orders", "lineitem"))
      s.sql(threeWayJoinSql)
    }),

    // ── U1 union-all of date slices + aggregation.
    "q08_union_slices" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val early = o.filter(year(col("o_orderdate")) <= 1996)
      val late = o.filter(year(col("o_orderdate")) >= 1999)
      early.unionByName(late)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    }),

    // ── §2.5 per-key summary (TODO.md:6-19 surface): min/max/first/last.
    "q09_per_key_summary" -> ((s, dir) =>
      Summaries.perKey(events(s, dir), "user_id", "event_id", "value")
        .orderBy("user_id")),

    // ── §2.5 lookback lags (TODO.md:10-19): k observations back, one window.
    "q10_lookbacks" -> ((s, dir) => {
      Summaries.lookbacks(events(s, dir), "user_id", "event_id", "value", Seq(1, 3, 7))
        .select("event_id", "user_id", "value", "value_lag_1", "value_lag_3", "value_lag_7")
        .orderBy("event_id")
    }),

    // ── NOTES.md:15-31 growth stats: per-date cardinality + growth %.
    "q11_growth" -> ((s, dir) =>
      Summaries.growth(events(s, dir).withColumn("d", to_date(col("ts"))), "d")
        .orderBy("d")),

    // ── C5 date sequence + explode (util.py:256-262 iter_dates_in_range).
    "q12_date_spine" -> ((s, dir) => {
      t(s, dir, "orders")
        .agg(min(to_date(col("o_orderdate"))).as("a"), max(to_date(col("o_orderdate"))).as("b"))
        .select(explode(sequence(col("a"), col("b"), expr("interval 1 day"))).as("d"))
        .orderBy("d")
    }),

    // ── C1/P7 rounding — on integer-valued targets, so round-half behavior
    // can never diverge across engines.
    "q13_round" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_discount") * 100, 0).cast("long").as("disc_pct"),
          round(col("l_tax") * 100, 0).cast("long").as("tax_pct"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ── C2/C4/C6 date coercion + arithmetic.
    "q14_date_arith" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(min(to_date(col("o_orderdate"))).as("first_order"),
          max(to_date(col("o_orderdate"))).as("last_order"))
        .withColumn("day_after_last", date_add(col("last_order"), 1))
        .orderBy("o_custkey")
    }),

    // ── set ops: distinct.
    "q15_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .dropDuplicates()
        .orderBy("o_orderpriority", "o_orderstatus")),

    // ── C7 regex extract (filename-date inference twin, util.py:242-247).
    "q16_regex_extract" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
        .orderBy("event_id"))
  )

  private val threeWayJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_rows,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_changed_values" ->
      """SELECT event_id, user_id, value FROM (
        | SELECT event_id, user_id, value,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
        | FROM events) WHERE d <> 0 ORDER BY event_id""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q03_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_quantity BETWEEN 10 AND 40 AND l_discount >= 0.02 AND l_discount <= 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_rlike_filter" ->
      """SELECT p_partkey, p_type, p_brand FROM part
        |WHERE regexp_matches(p_type, 'ECONOMY|LARGE') ORDER BY p_partkey""".stripMargin,
    "q05_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q06_join_broadcast" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q07_sql_3way_join" -> threeWayJoinSql,
    "q08_union_slices" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (SELECT * FROM orders WHERE year(o_orderdate) <= 1996
        |      UNION ALL
        |      SELECT * FROM orders WHERE year(o_orderdate) >= 1999)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_per_key_summary" ->
      """SELECT user_id, min(value) AS min_value, max(value) AS max_value,
        | arg_min(value, event_id) AS first_value, arg_max(value, event_id) AS last_value,
        | count(*) AS n_rows
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q10_lookbacks" ->
      """SELECT event_id, user_id, value,
        | lag(value, 1) OVER w AS value_lag_1,
        | lag(value, 3) OVER w AS value_lag_3,
        | lag(value, 7) OVER w AS value_lag_7
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,
    "q11_growth" ->
      """SELECT d, n, prev_n, (n - prev_n) * CAST(100 AS DOUBLE) / prev_n AS growth_pct
        |FROM (SELECT d, n, lag(n, 1) OVER (ORDER BY d) AS prev_n
        |      FROM (SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1))
        |ORDER BY d""".stripMargin,
    "q12_date_spine" ->
      """SELECT CAST(unnest(generate_series(a, b, INTERVAL 1 DAY)) AS DATE) AS d
        |FROM (SELECT CAST(min(o_orderdate) AS DATE) AS a, CAST(max(o_orderdate) AS DATE) AS b
        |      FROM orders) ORDER BY d""".stripMargin,
    "q13_round" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_pct,
        | CAST(round(l_tax * 100, 0) AS BIGINT) AS tax_pct
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q14_date_arith" ->
      """SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS first_order,
        | CAST(max(o_orderdate) AS DATE) AS last_order,
        | CAST(CAST(max(o_orderdate) AS DATE) + INTERVAL 1 DAY AS DATE) AS day_after_last
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
        |ORDER BY 1, 2""".stripMargin,
    "q16_regex_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
