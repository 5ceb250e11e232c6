package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window / event-time pack over `events` — SURVEY §2.5 (the reference's
  * W3/W5 rank-and-first analogues) plus the net-new time-series surface
  * called out in §2.5/§7: ranking windows, lag/lead, row frames, and
  * tumbling / sliding / session event-time windows (batch forms of the
  * §2.9 streaming layer; the streaming variants share these exact
  * aggregations via `graft.streaming`).
  *
  * Scale notes: every per-user window here shuffles ONCE on user_id and
  * reuses that single hash partitioning for sort+window — at 100 TB the
  * cost is one exchange, with AQE coalescing skewed partitions. The
  * event-time windows are plain hash aggregations (partial map-side
  * combine, no per-key state), so they scale linearly with input.
  * Determinism: every ORDER BY carries event_id as a tiebreaker and all
  * double outputs are rounded AFTER aggregation (SURVEY §7 traps).
  */
object WindowQueries {

  private def byUserTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))

  /** W3-analogue as a true window op: rank per user by (value desc,
    * event_id) — keep each user's top-3 events. */
  def winRankTop3(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rnk"))
  }

  /** lag: per-user inter-event value delta (net-new; no reference op). */
  def winLagDelta(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(byUserTime))
      .select(col("event_id"), col("user_id"),
        round(col("value") - col("prev_value"), 6).as("delta"))

  /** row frame: 3-row moving average per user (ROWS 2 PRECEDING..CURRENT). */
  def winMovingAvg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("mavg",
        round(avg(col("value")).over(byUserTime.rowsBetween(-2, 0)), 6))
      .select(col("event_id"), col("user_id"), col("mavg"))

  /** first_value / last_value / nth_value over an explicit unbounded
    * frame (completing the frame-function surface): each event row
    * carries its user's first, last, and second event value in time
    * order. Deterministic (ts, event_id) ordering; one shuffle on
    * user_id shared by all three functions. */
  def winFirstLastNth(spark: SparkSession, dir: String): DataFrame = {
    val full = byUserTime.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .withColumn("first_v", round(first(col("value")).over(full), 6))
      .withColumn("last_v", round(last(col("value")).over(full), 6))
      .withColumn("second_v", round(nth_value(col("value"), 2).over(full), 6))
      .select(col("event_id"), col("user_id"), col("first_v"), col("last_v"), col("second_v"))
  }

  /** AS-OF JOIN (net-new; SURVEY §2.3 notes the reference lacks it):
    * each purchase matched to the user's most recent STRICTLY-earlier
    * click. Composed from existing ops (preference (a) of the custom-
    * operator ladder): filter both event roles into ONE relation, then
    * a running `max` over a range frame ending 1 µs before the current
    * row — a single shuffle on user_id, no join at all, where the naive
    * plan is an N×M theta-join per user. The strict `<` at microsecond
    * precision is pinned on both sides (oracle casts ns→µs before its
    * native ASOF JOIN) so tie semantics can't drift between engines. */
  def asofJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("tus"),
        when(col("event_type") === "click", unix_micros(col("ts"))).as("click_us"))
    val w = Window.partitionBy("user_id").orderBy(col("tus"))
      .rangeBetween(Window.unboundedPreceding, -1L)
    e.withColumn("asof_us", max(col("click_us")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), timestamp_micros(col("asof_us")).as("asof_click_ts"))
  }

  /** Tumbling 1-hour event-time window (batch form of the streaming
    * windowed agg — epoch-aligned, same as DuckDB date_trunc). */
  def winTumblingHour(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour window, 30-min slide: each event lands in exactly
    * two windows; pure hash-agg after the window fan-out. */
  def winSlidingHour(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** Session windows: 30-min inactivity gap per user. Output is the
    * gaps-and-islands shape (first/last event ts + count) so the oracle
    * can express identical semantics with lag + running sum. */
  def winSessionize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  /** A5 (finalize_realease.py:169-173): mean of top-3 values per group.
    * Composed form: sort+slice+aggregate over collect_list — the
    * bounded-heap `TypedImperativeAggregate` variant is `graft.expr.TopK`
    * (same semantics, no full collect; used by topk_mean_agg query). */
  def a5TopkMean(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(slice(sort_array(collect_list(col("value")), asc = false), 1, 3).as("top3"))
      .select(col("user_id"),
        round(aggregate(col("top3"), lit(0.0d), _ + _) / size(col("top3")), 6)
          .as("topk_mean"))

  /** A5/D6 as a custom `TypedImperativeAggregate`: same semantics as
    * [[a5TopkMean]] but O(k) state per group (bounded min-heap) instead
    * of buffering the whole group — the form that survives groups with
    * millions of rows. */
  def topkMeanAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(round(graft.expr.aggfunctions.topk_mean(col("value"), 3), 6).as("topk_mean"))

  /** A6 (finalize_realease.py:215-217): max + argmax via a single
    * struct-max aggregation (one map-side-combinable agg, no window
    * shuffle); ties broken by event_id — deterministic. */
  def a6MaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      // max_tuple ≡ max(struct(value, event_id)) but hash-aggregable
      // (primitive buffer slots vs a struct buffer that forced a
      // SortAggregate over the full event stream — r15)
      .agg(graft.expr.tupleagg.max_tuple(col("value"), col("event_id")).as("m"))
      .select(col("event_type"), col("m.value").as("max_value"),
        col("m.event_id").as("max_event_id"))

  /** A9 (finalize_realease.py:175-182): threshold labeling via a when
    * chain, then distribution count. */
  def a9ThresholdLabel(spark: SparkSession, dir: String): DataFrame = {
    val v = col("value")
    val label = when(v >= 70.0, "high")
      .when(v >= 50.0, "medium")
      .when(v >= 30.0, "low")
      .otherwise("very-low")
    Tables.events(spark, dir)
      .select(label.as("value_band"))
      .groupBy(col("value_band")).agg(count(lit(1)).as("n"))
  }

  /** W5 as a window op (vs the agg form in RelationalQueries): first
    * event per (user, event_type) by time. */
  def w5FirstEventPerType(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
  }

  /** RANGE JOIN, bucketed (net-new): per purchase, the user's clicks in
    * the strictly-preceding hour. The naive form is an inequality
    * theta-join (cartesian per user at any scale); the scale path
    * buckets time into window-width slots and turns the range predicate
    * into an EQUI-join on (user_id, bucket) — each click is exploded
    * into its own and the next bucket (a window of one bucket width
    * spans at most two slots), the exact range condition then filters
    * the co-partitioned candidates. Shuffle volume: 2x the click rows
    * on a uniformly distributed key — no cartesian anywhere. */
  def rangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val BucketUs = 3600L * 1000000L
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pts"))
      .withColumn("bkt", floor(col("pts") / BucketUs))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cts"))
      .withColumn("cbkt", floor(col("cts") / BucketUs))
      .select(col("user_id"), col("cts"),
        explode(array(col("cbkt"), col("cbkt") + 1)).as("bkt"))
    p.join(c, Seq("user_id", "bkt"))
      .filter(col("cts") >= col("pts") - BucketUs && col("cts") < col("pts"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"), max(col("cts")).as("last_click_us"))
  }

  /** Distribution ranking functions (net-new; completes the window
    * family): quartile bucket, percent_rank, cume_dist per user over
    * event time — all computed in the ONE per-user sort the other
    * per-user windows already pay. */
  def winDistributionRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  /** Custom physical operator (extension ladder rung (c), see
    * graft.plans.TopKPerKey): top-3 events by value per user as WHOLE
    * ROWS with O(keys·k) state — same semantics as the
    * `row_number() <= 3` window (the oracle), without the full
    * per-group sort. Spec asserts TopKPerKeyExec in the plan. */
  def topkCustomOp(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKeyOp(
      Tables.events(spark, dir).select(col("user_id"), col("event_id"), col("value")),
      keys = Seq(col("user_id")),
      order = Seq(col("value").desc, col("event_id").asc),
      k = 3)

  /** Value-based RANGE window frame (trailing 10-minute sum per
    * event): the frame is defined by the ORDER-BY VALUE, not row
    * offsets — ties at equal timestamps all enter the frame, and gaps
    * shrink it, which row frames cannot express. Ordering runs on
    * exact epoch-microsecond longs (unix_micros / epoch_us) so both
    * engines compute identical frames. One shuffle (the per-type
    * window partitioning); the frame itself is a streaming
    * accumulator inside the sorted partition — no extra pass. */
  def winRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events_rf")
    spark.sql(
      """SELECT event_id, count(*) OVER w AS n_win,
        |       round(sum(value) OVER w, 6) AS sum_win
        |FROM (SELECT event_id, event_type, value, unix_micros(ts) AS us FROM events_rf)
        |WINDOW w AS (PARTITION BY event_type ORDER BY us
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |""".stripMargin)
  }

  val EwmaAlpha = 0.1

  /** Per-user EWMA (exponentially weighted moving average) — the
    * RECURSIVE time-series smoother (s₀ = v₀, sᵢ = (1−α)·sᵢ₋₁ + α·vᵢ)
    * that no window frame can express: each step depends on the
    * previous output. Computed as an ORDERED LEFT FOLD over the
    * per-user event sequence (collect → sort by (ts, event_id) →
    * `aggregate` HOF), which is also exactly how the oracle replays it
    * (`list_reduce` over `list(value ORDER BY ...)`) — both engines
    * run the IDENTICAL sequence of IEEE ops, so the result is
    * bit-comparable before the 6-dp round. One user-keyed shuffle;
    * per-user state is the event list (bounded by the session horizon
    * at 100 TB — the continuous form is t4's mapGroupsWithState
    * carrying just the scalar). */
  def winEwma(spark: SparkSession, dir: String): DataFrame = {
    val arr = array_sort(collect_list(struct(col("ts"), col("event_id"), col("value"))))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(arr.as("evs"))
      .select(col("user_id"), size(col("evs")).cast("long").as("n_events"),
        round(aggregate(
          slice(col("evs"), lit(2), greatest(size(col("evs")) - 1, lit(0))),
          element_at(col("evs"), 1).getField("value"),
          (acc, x) => acc * (1.0 - EwmaAlpha) + x.getField("value") * EwmaAlpha),
          6).as("ewma"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_ewma" -> (winEwma _),
    "win_range_frame" -> (winRangeFrame _),
    "win_distribution_ranks" -> (winDistributionRanks _),
    "topk_custom_op"     -> (topkCustomOp _),
    "win_first_last_nth" -> (winFirstLastNth _),
    "win_rank_top3"      -> (winRankTop3 _),
    "win_lag_delta"      -> (winLagDelta _),
    "win_moving_avg"     -> (winMovingAvg _),
    "asof_join_events"   -> (asofJoinEvents _),
    "range_join_bucketed" -> (rangeJoinBucketed _),
    "win_tumbling_hour"  -> (winTumblingHour _),
    "win_sliding_hour"   -> (winSlidingHour _),
    "win_sessionize"     -> (winSessionize _),
    "a5_topk_mean"       -> (a5TopkMean _),
    "topk_mean_agg"      -> (topkMeanAgg _),
    "a6_max_by"          -> (a6MaxBy _),
    "a9_threshold_label" -> (a9ThresholdLabel _),
    "w5_first_event_per_type" -> (w5FirstEventPerType _),
  )

  val oracle: Map[String, String] = Map(
    "win_ewma" ->
      ("SELECT user_id, count(*) AS n_events, " +
       s"round(list_reduce(list(value ORDER BY ts, event_id), " +
       s"(acc, x) -> acc * (1.0 - $EwmaAlpha) + x * $EwmaAlpha), 6) AS ewma " +
       "FROM events GROUP BY user_id"),
    "win_range_frame" ->
      ("SELECT event_id, count(*) OVER w AS n_win, round(sum(value) OVER w, 6) AS sum_win " +
       "FROM (SELECT event_id, event_type, value, epoch_us(ts) AS us FROM events) " +
       "WINDOW w AS (PARTITION BY event_type ORDER BY us " +
       "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)"),
    "win_first_last_nth" ->
      ("SELECT event_id, user_id, " +
       "round(first_value(value) OVER w, 6) AS first_v, " +
       "round(last_value(value) OVER w, 6) AS last_v, " +
       "round(nth_value(value, 2) OVER w, 6) AS second_v " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"),
    "win_rank_top3" ->
      ("SELECT user_id, event_id, value, rnk FROM (SELECT user_id, event_id, value, " +
       "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk " +
       "FROM events) WHERE rnk <= 3"),
    "win_lag_delta" ->
      ("SELECT event_id, user_id, round(value - lag(value, 1) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta FROM events"),
    "win_moving_avg" ->
      ("SELECT event_id, user_id, round(avg(value) OVER (PARTITION BY user_id " +
       "ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg FROM events"),
    "asof_join_events" ->
      ("WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'), " +
       "c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'click') " +
       "SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts, c.ts AS asof_click_ts " +
       "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts"),
    "topk_custom_op" ->
      ("SELECT user_id, event_id, value FROM (" +
       "SELECT user_id, event_id, value, row_number() OVER " +
       "(PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn " +
       "FROM events) WHERE rn <= 3"),
    "win_distribution_ranks" ->
      ("SELECT user_id, event_id, " +
       "ntile(4) OVER w AS quartile, " +
       "round(percent_rank() OVER w, 6) AS pct_rank, " +
       "round(cume_dist() OVER w, 6) AS cume " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)"),
    "range_join_bucketed" ->
      ("WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pts " +
       "FROM events WHERE event_type = 'purchase'), " +
       "c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS cts FROM events WHERE event_type = 'click') " +
       "SELECT purchase_id, count(*) AS n_clicks, max(cts) AS last_click_us " +
       "FROM p JOIN c ON p.user_id = c.user_id " +
       "AND c.cts >= p.pts - 3600000000 AND c.cts < p.pts " +
       "GROUP BY purchase_id"),
    "win_tumbling_hour" ->
      ("SELECT date_trunc('hour', ts) AS window_start, event_type, " +
       "count(*) AS n_events, round(sum(value), 6) AS sum_value FROM events " +
       "GROUP BY window_start, event_type"),
    "win_sliding_hour" ->
      ("SELECT window_start, count(*) AS n_events FROM (SELECT unnest([" +
       "time_bucket(INTERVAL '30 minutes', ts), " +
       "time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS window_start " +
       "FROM events) GROUP BY window_start"),
    "win_sessionize" ->
      ("WITH flagged AS (SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER w IS NULL " +
       "OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
       "grp AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id " +
       "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM flagged) " +
       "SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, " +
       "count(*) AS n_events FROM grp GROUP BY user_id, sid"),
    "a5_topk_mean" ->
      ("SELECT user_id, round(avg(value), 6) AS topk_mean FROM (SELECT user_id, value, " +
       "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn " +
       "FROM events) WHERE rn <= 3 GROUP BY user_id"),
    "topk_mean_agg" ->
      ("SELECT user_id, round(avg(value), 6) AS topk_mean FROM (SELECT user_id, value, " +
       "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn " +
       "FROM events) WHERE rn <= 3 GROUP BY user_id"),
    "a6_max_by" ->
      ("SELECT event_type, value AS max_value, event_id AS max_event_id FROM (" +
       "SELECT event_type, value, event_id, row_number() OVER (PARTITION BY event_type " +
       "ORDER BY value DESC, event_id DESC) AS rn FROM events) WHERE rn = 1"),
    "a9_threshold_label" ->
      ("SELECT CASE WHEN value >= 70 THEN 'high' WHEN value >= 50 THEN 'medium' " +
       "WHEN value >= 30 THEN 'low' ELSE 'very-low' END AS value_band, count(*) AS n " +
       "FROM events GROUP BY value_band"),
    "w5_first_event_per_type" ->
      ("SELECT user_id, event_type, event_id AS first_event_id FROM (SELECT user_id, " +
       "event_type, event_id, row_number() OVER (PARTITION BY user_id, event_type " +
       "ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1"),
  )
}
