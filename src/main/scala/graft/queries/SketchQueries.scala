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
  // rank accuracy 1/2000: plenty for p50/p95 while keeping the sketch
  // update cost low — accuracy 10000 measured ~4x slower end-to-end for
  // no observable gain at these quantiles
  val QuantileAcc = 2000

  /** Per event-type: approx distinct users + p50/p95 value sketch.
    * No exact countDistinct in here: mixing a distinct aggregate with
    * the imperative sketch aggregates forces an Expand + sort-based
    * plan (measured ~4x slower); sketches alone stay in one
    * ObjectHashAggregate with mergeable partial state. The spec
    * computes the exact answers in a separate query to pin error
    * bounds. */
  def sketchCardinalityQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), Rsd).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(QuantileAcc))
          .as("value_p50_p95"))
      .select(col("event_type"), col("approx_users"),
        round(element_at(col("value_p50_p95"), 1), 6).as("value_p50"),
        round(element_at(col("value_p50_p95"), 2), 6).as("value_p95"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cardinality_quantiles" -> (sketchCardinalityQuantiles _),
  )

  /** Sketch layouts are engine-specific → rows-only (spec pins error
    * bounds vs exact). */
  val oracle: Map[String, String] = Map.empty
}
