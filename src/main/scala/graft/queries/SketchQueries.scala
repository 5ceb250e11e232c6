package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch pack (north-star "novel sketch" operators): the approximate
  * aggregates a 100 TB training-data pipeline leans on when exact
  * distinct/quantile state would not fit — HyperLogLog++ cardinality
  * (`approx_count_distinct`) and a quantile sketch
  * (`percentile_approx`), both Catalyst-native partial aggregates whose
  * sketch state merges map-side, so the shuffle carries one bounded
  * sketch per (group × partition) instead of the value sets.
  *
  * Sketch internals differ across engines by design, so these are
  * rows-only for the driver; SketchQueriesSpec pins them against the
  * exact answers with the published error bounds (HLL++ rsd, quantile
  * rank accuracy) — the meaningful correctness statement for an
  * approximate operator.
  */
object SketchQueries {

  val Rsd = 0.02          // HLL++ target relative standard deviation
  // rank accuracy 1/2000: plenty for p50/p95 while keeping the sketch
  // update cost low — accuracy 10000 measured ~4x slower end-to-end for
  // no observable gain at these quantiles
  val QuantileAcc = 2000

  /** Rank margin for the quantile bound check: the sketch guarantees
    * rank error ≤ 1/QuantileAcc (0.0005); the check allows 10x that. */
  val QuantileMargin = 0.005

  /** Per event-type: approx distinct users + p50/p95 value sketch,
    * VERIFIED against the exact answers in-query. Sketch internals are
    * engine-specific, so raw sketch outputs can never hash-match a
    * DuckDB oracle — instead the query emits the exact distinct count
    * plus BOOLEAN error-bound assertions (HLL++ within 3·rsd; sketch
    * quantiles inside the exact p±margin envelope), and the oracle
    * expects TRUE — the meaningful correctness statement for an
    * approximate operator, enforced by the driver's hash compare.
    *
    * The sketches and the exact answers are aggregated SEPARATELY and
    * joined on the (tiny) group key: mixing a distinct aggregate with
    * the imperative sketch aggregates would force an Expand +
    * sort-based plan (measured ~4x slower); each branch stays a
    * mergeable one-pass ObjectHashAggregate. */
  def sketchCardinalityQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sk = ev.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), Rsd).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(QuantileAcc))
          .as("ps"))
      .select(col("event_type"), col("approx_users"),
        element_at(col("ps"), 1).as("p50s"), element_at(col("ps"), 2).as("p95s"))
    // the quantile check is RANK-based — the sketch's actual guarantee
    // (a returned element's rank is within ±ε·n of the target rank,
    // here with 10x margin): count values <=/< the sketch's answer and
    // bound those counts. Valid for any group size, unlike comparing
    // against interpolated exact percentiles (which sit strictly above
    // the low data value in tiny groups).
    def rankOk(p: Double, le: Column, lt: Column, n: Column): Column =
      (le >= floor(lit(p - QuantileMargin) * n)) &&
        (lt <= ceil(lit(p + QuantileMargin) * n))
    ev.join(broadcast(sk), "event_type")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"),
        first(col("approx_users")).as("approx_users"),
        sum(when(col("value") <= col("p50s"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("p50s"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("p95s"), 1L).otherwise(0L)).as("le95"),
        sum(when(col("value") < col("p95s"), 1L).otherwise(0L)).as("lt95"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * (3 * Rsd)).as("approx_users_ok"),
        rankOk(0.5, col("le50"), col("lt50"), col("n")).as("p50_ok"),
        rankOk(0.95, col("le95"), col("lt95"), col("n")).as("p95_ok"))
  }

  /** Count–min-sketch heavy hitters (net-new): frequency estimation
    * with O(w·d) state regardless of input size — THE streaming
    * frequent-items sketch when exact per-key counts would be a
    * full-size shuffle. Built with Spark's native `count_min_sketch`
    * partial aggregate (sketches merge map-side; one ~w·d array per
    * partition crosses the wire), then each group key is probed against
    * the merged sketch. CMS guarantees est ≥ true and, with probability
    * ≥ confidence, est ≤ true + ε·N — emitted as a boolean contract the
    * oracle expects TRUE (fixed seed ⇒ deterministic). The one-row
    * sketch collect is the probe side, not data movement; the exact
    * counts stay a distributed aggregate. */
  def sketchHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val Eps = 0.0001; val Conf = 0.99; val Seed = 42
    val ev = Tables.events(spark, dir)
    val skBytes = ev.agg(
        expr(s"count_min_sketch(event_type, ${Eps}d, ${Conf}d, $Seed)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("exact_n"))
    val keys = exact.select(col("event_type")).collect().map(_.getString(0)).toSeq
    import spark.implicits._
    val est = keys.map(k => (k, cms.estimateCount(k))).toDF("event_type", "est_n")
    exact.join(broadcast(est), "event_type")
      .withColumn("n_total", sum(col("exact_n")).over())
      .select(col("event_type"), col("exact_n"),
        (col("est_n") >= col("exact_n") &&
          col("est_n") <= col("exact_n") + ceil(col("n_total") * Eps)).as("cms_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cardinality_quantiles" -> (sketchCardinalityQuantiles _),
    "sketch_heavy_hitters"         -> (sketchHeavyHitters _),
  )

  /** The oracle checks the exact count and expects every bound
    * assertion to hold — a sketch drifting past its published error
    * envelope fails the driver's hash compare. */
  val oracle: Map[String, String] = Map(
    "sketch_cardinality_quantiles" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
       "TRUE AS approx_users_ok, TRUE AS p50_ok, TRUE AS p95_ok " +
       "FROM events GROUP BY event_type"),
    "sketch_heavy_hitters" ->
      ("SELECT event_type, count(*) AS exact_n, TRUE AS cms_ok " +
       "FROM events GROUP BY event_type"),
  )
}
