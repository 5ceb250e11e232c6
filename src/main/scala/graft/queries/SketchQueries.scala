package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  val QuantileAcc = 10000 // percentile_approx rank accuracy

  /** Per event-type: approx distinct users + p50/p95 value sketch,
    * alongside the exact distinct count for in-row comparability. */
  def sketchCardinalityQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), Rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(QuantileAcc))
          .as("value_p50_p95"))
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        round(element_at(col("value_p50_p95"), 1), 6).as("value_p50"),
        round(element_at(col("value_p50_p95"), 2), 6).as("value_p95"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cardinality_quantiles" -> (sketchCardinalityQuantiles _),
  )

  /** Sketch layouts are engine-specific → rows-only (spec pins error
    * bounds vs exact). */
  val oracle: Map[String, String] = Map.empty
}
