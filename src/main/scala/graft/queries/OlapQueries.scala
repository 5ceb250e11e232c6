package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Net-new OLAP operator pack (no reference counterpart — SURVEY §2.4
  * notes the reference has no grouping sets / cube / rollup and no
  * sampling; a complete engine needs them, and training-data pipelines
  * lean on deterministic sampling constantly).
  *
  * Scale notes: rollup/cube are plain hash aggregates — Spark expands
  * to grouping sets and keeps partial aggregation, so the exchange
  * carries one partial row per (set, key) per task. Pivot with an
  * explicit value list is a single conditional aggregate (no second
  * scan, no distinct-values job). Hash-mod sampling is a scan-stage
  * filter: it pushes to the source, costs one md5 per row, needs no
  * sort, no sample() RNG state, and picks the SAME rows on every
  * engine — which is why it is the reproducible-training-subset
  * idiom (and why it is oracle-checkable at all).
  */
object OlapQueries {

  /** ROLLUP (priority, status): per-group + per-priority + grand
    * totals. Rollup nulls are labeled 'ALL' (the grouped columns are
    * non-null in the data, so the label is unambiguous). */
  def olapRollupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("sum_price"))

  /** CUBE (returnflag, linestatus): all four grouping sets in one
    * aggregate over lineitem. */
  def olapCubeLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        round(avg(col("l_quantity")), 6).as("avg_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_items"), col("avg_qty"))

  /** PIVOT order status → one count column per status, keyed by
    * priority. The explicit value list keeps it a single conditional
    * aggregate (no distinct-values pre-job, stable output schema). */
  def olapPivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      // empty pivot cells are NULL counts in Spark but 0 under the
      // oracle's FILTER form — normalize
      .select(col("priority"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_finished"),
        coalesce(col("P"), lit(0L)).as("n_pending"))

  /** Deterministic hash-mod sample (~25%): md5 of the key decides
    * membership, so the subset is stable across runs AND engines —
    * the reproducible-sampling idiom for training-data pipelines
    * (sample(), by contrast, is RNG-and-partitioning dependent). */
  def xSampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(ascii(substring(md5(col("l_orderkey").cast("string")), 1, 1)) % 4 === 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))

  /** Stratified deterministic sample: per-stratum rates (R:1/8, A:2/8,
    * N:3/8) from the same md5 hash — the class-rebalancing form. */
  def xSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val bucket = ascii(substring(md5(col("l_orderkey").cast("string")), 1, 1)) % 8
    val rate = when(col("l_returnflag") === "R", 1)
      .when(col("l_returnflag") === "A", 2).otherwise(3)
    Tables.lineitem(spark, dir)
      .filter(bucket < rate)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
  }

  /** Exact continuous percentiles per group (the EXACT counterpart of
    * the sketch pack's approximate quantiles; both engines define
    * percentile/quantile_cont as linear rank interpolation). Exact
    * percentile is a sort-based aggregate — fine per group here, and
    * the 100 TB path swaps in percentile_approx's mergeable sketch. */
  def aggExactPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  /** Statistical moments + bivariate stats per group: stddev/variance
    * (sample), covariance and Pearson correlation of value vs user_id —
    * all single-pass mergeable aggregates with identical definitions
    * across engines. */
  def aggStatsMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(round(stddev_samp(col("value")), 6).as("sd_value"),
        round(var_samp(col("value")), 6).as("var_value"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 6).as("covar_vu"),
        round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_vu"))

  /** Unpivot/melt (net-new, the inverse of `olap_pivot_status`): three
    * per-row measures rotated into (measure, val) long form — the shape
    * feature pipelines want before a per-measure groupBy. `Dataset
    * .unpivot` plans as a single Expand (3 output rows per input, no
    * shuffle, no join); the aggregation on top shuffles the tiny
    * (measure,) keyspace only. */
  def olapUnpivotMelt(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("val")), 2).as("sum_val"),
        round(min(col("val")), 2).as("min_val"), round(max(col("val")), 2).as("max_val"))

  /** Conversion funnel (net-new): per-user first-touch times for the
    * view→click→purchase stage sequence, then ordered-stage reach
    * counts — the standard event-analytics funnel, as ONE groupBy(user)
    * with conditional min aggregates plus one global conditional sum
    * (no joins, no window sort; first-touch ordering is the usual
    * funnel approximation). Scale: the only real shuffle keys on
    * user_id with map-side partial aggregation; the second aggregate is
    * a single-row reduction. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stage = ev.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view", col("ts"))).as("t_view"),
      min(when(col("event_type") === "click", col("ts"))).as("t_click"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    val reachedView = col("t_view").isNotNull
    val reachedClick = reachedView && col("t_click").isNotNull && col("t_click") >= col("t_view")
    val reachedPurchase = reachedClick && col("t_purchase").isNotNull && col("t_purchase") >= col("t_click")
    stage.agg(count(lit(1)).as("n_users"),
      sum(reachedView.cast("long")).as("n_view"),
      sum(reachedClick.cast("long")).as("n_view_click"),
      sum(reachedPurchase.cast("long")).as("n_full_funnel"))
  }

  /** Cohort retention (net-new): users cohorted by FIRST purchase day,
    * then distinct purchasing users per (cohort_day, days-since-first)
    * cell — the retention matrix every engagement pipeline computes.
    * Two shuffles, both keyed on user_id (the cohort aggregate and the
    * join back are co-partitioned, so the second exchange is reused);
    * the final cell aggregate is a tiny (days × offsets) keyspace. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = p.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    p.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Explicit GROUPING SETS with grouping() disambiguation — the
    * general form that cube/rollup specialize (a reporting layer
    * usually wants a HAND-PICKED set list, not the full lattice).
    * Spark plans ONE Expand + one aggregate for all four sets — the
    * corpus is scanned once regardless of set count, which is the
    * 100 TB property. grouping() flags are cast to BIGINT on both
    * engines (Spark emits tinyint, DuckDB int64). */
  def olapGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |       cast(grouping(o_orderpriority) AS BIGINT) AS g_pri,
        |       cast(grouping(o_orderstatus) AS BIGINT) AS g_st,
        |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |                        (o_orderpriority), (o_orderstatus), ())
        |""".stripMargin)
  }

  /** Gini coefficient per group (the inequality metric data-mixing
    * diagnostics watch: how concentrated is the value mass): rank
    * within group ascending (value, event_id tiebreak — Σi·x is
    * invariant under tie permutations, so the tiebreak only pins
    * determinism), then G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n. One window
    * shuffle shared with the per-group aggregate; arithmetic shapes
    * mirrored verbatim in the oracle. Gini is a rank statistic — the
    * within-group sort is inherent to the exact form; the 100 TB path
    * is a value-bucketed prefix-sum of ranks (exact, two passes) or
    * the standard histogram approximation, both outside this exact
    * query's contract. */
  def aggGini(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("value").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        row_number().over(w).cast("long").as("i"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sumx"),
        sum(col("i") * col("value")).as("sumix"))
      .select(col("event_type"), col("n").as("n_events"),
        round((lit(2.0) * col("sumix")) / (col("n") * col("sumx")) -
          (col("n") + lit(1.0)) / col("n"), 6).as("gini"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_gini" -> (aggGini _),
    "olap_grouping_sets" -> (olapGroupingSets _),
    "funnel_conversion"     -> (funnelConversion _),
    "cohort_retention"      -> (cohortRetention _),
    "olap_unpivot_melt"     -> (olapUnpivotMelt _),
    "agg_exact_percentiles" -> (aggExactPercentiles _),
    "agg_stats_moments"   -> (aggStatsMoments _),
    "olap_rollup_orders"  -> (olapRollupOrders _),
    "olap_cube_lineitem"  -> (olapCubeLineitem _),
    "olap_pivot_status"   -> (olapPivotStatus _),
    "x_sample_hash"       -> (xSampleHash _),
    "x_sample_stratified" -> (xSampleStratified _),
  )

  val oracle: Map[String, String] = Map(
    "agg_gini" ->
      ("WITH r AS (SELECT event_type, value, " +
       "row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS i " +
       "FROM events), " +
       "a AS (SELECT event_type, count(*) AS n, sum(value) AS sumx, " +
       "sum(i * value) AS sumix FROM r GROUP BY event_type) " +
       "SELECT event_type, n AS n_events, " +
       "round((2.0 * sumix) / (n * sumx) - (n + 1.0) / n, 6) AS gini FROM a"),
    "olap_grouping_sets" ->
      ("SELECT o_orderpriority, o_orderstatus, " +
       "grouping(o_orderpriority)::BIGINT AS g_pri, grouping(o_orderstatus)::BIGINT AS g_st, " +
       "count(*) AS n_orders, round(sum(o_totalprice), 2) AS total FROM orders " +
       "GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), " +
       "(o_orderpriority), (o_orderstatus), ())"),
    "funnel_conversion" ->
      ("WITH stage AS (SELECT user_id, " +
       "min(CASE WHEN event_type = 'view' THEN ts END) AS t_view, " +
       "min(CASE WHEN event_type = 'click' THEN ts END) AS t_click, " +
       "min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase " +
       "FROM events GROUP BY user_id) " +
       "SELECT count(*) AS n_users, " +
       "sum((t_view IS NOT NULL)::BIGINT)::BIGINT AS n_view, " +
       "sum((t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view)::BIGINT)::BIGINT AS n_view_click, " +
       "sum((t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view " +
       "AND t_purchase IS NOT NULL AND t_purchase >= t_click)::BIGINT)::BIGINT AS n_full_funnel " +
       "FROM stage"),
    "cohort_retention" ->
      ("WITH p AS (SELECT user_id, ts::DATE AS day FROM events WHERE event_type = 'purchase'), " +
       "cohort AS (SELECT user_id, min(day) AS cohort_day FROM p GROUP BY user_id) " +
       "SELECT c.cohort_day, date_diff('day', c.cohort_day, p.day)::BIGINT AS day_offset, " +
       "count(DISTINCT p.user_id) AS n_users " +
       "FROM p JOIN cohort c USING (user_id) GROUP BY c.cohort_day, day_offset"),
    "olap_unpivot_melt" ->
      ("WITH m AS (SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem " +
       "UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem " +
       "UNION ALL SELECT 'l_discount', l_discount FROM lineitem) " +
       "SELECT measure, count(*) AS n_rows, round(sum(val), 2) AS sum_val, " +
       "round(min(val), 2) AS min_val, round(max(val), 2) AS max_val " +
       "FROM m GROUP BY measure"),
    "agg_exact_percentiles" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
       "round(quantile_cont(value, 0.9), 6) AS p90, " +
       "round(quantile_cont(value, 0.99), 6) AS p99 FROM events GROUP BY event_type"),
    "agg_stats_moments" ->
      ("SELECT event_type, round(stddev_samp(value), 6) AS sd_value, " +
       "round(var_samp(value), 6) AS var_value, " +
       "round(covar_samp(value, user_id), 6) AS covar_vu, " +
       "round(corr(value, user_id), 6) AS corr_vu FROM events GROUP BY event_type"),
    "olap_rollup_orders" ->
      ("SELECT coalesce(o_orderpriority, 'ALL') AS priority, " +
       "coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n_orders, " +
       "round(sum(o_totalprice), 2) AS sum_price FROM orders " +
       "GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"),
    "olap_cube_lineitem" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS returnflag, " +
       "coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS n_items, " +
       "round(avg(l_quantity), 6) AS avg_qty FROM lineitem " +
       "GROUP BY CUBE (l_returnflag, l_linestatus)"),
    "olap_pivot_status" ->
      ("SELECT o_orderpriority AS priority, " +
       "count(*) FILTER (o_orderstatus = 'O') AS n_open, " +
       "count(*) FILTER (o_orderstatus = 'F') AS n_finished, " +
       "count(*) FILTER (o_orderstatus = 'P') AS n_pending " +
       "FROM orders GROUP BY o_orderpriority"),
    "x_sample_hash" ->
      ("SELECT l_returnflag, count(*) AS n_rows, " +
       "count(DISTINCT l_orderkey) AS n_orders, round(sum(l_quantity), 2) AS sum_qty " +
       "FROM lineitem WHERE ascii(substr(md5(l_orderkey::VARCHAR), 1, 1)) % 4 = 0 " +
       "GROUP BY l_returnflag"),
    "x_sample_stratified" ->
      ("SELECT l_returnflag, count(*) AS n_rows, " +
       "round(sum(l_extendedprice), 2) AS sum_price FROM lineitem " +
       "WHERE ascii(substr(md5(l_orderkey::VARCHAR), 1, 1)) % 8 < " +
       "(CASE WHEN l_returnflag = 'R' THEN 1 WHEN l_returnflag = 'A' THEN 2 ELSE 3 END) " +
       "GROUP BY l_returnflag"),
  )
}
