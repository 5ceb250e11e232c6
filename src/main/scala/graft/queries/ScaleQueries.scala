package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Physical-layout pack: the shuffle-elimination techniques that only
  * pay off at scale, exercised small so their plan shape is asserted
  * and their results oracle-checked.
  *
  * Bucketing is THE co-located-join tool at 100 TB: both fact tables
  * are written bucketed (and sorted) by the join key, so a repeated
  * orderkey join needs neither exchange nor sort — each task zips
  * bucket i of both sides. The one-time bucketed write amortizes over
  * every downstream join/aggregation on that key (the reference's
  * pipeline joins on pmid at three separate stages, which is exactly
  * this access pattern).
  */
object ScaleQueries {

  /** Bucketed co-located join: orders ⋈ lineitem on orderkey with both
    * sides bucketed by the key — the spec asserts the physical plan has
    * NO Exchange. The `merge` hint pins sort-merge join so the
    * zero-shuffle property comes from bucketing, not from a broadcast
    * fallback at this small SF. */
  def bucketedColocatedJoin(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.lang.Integer.toHexString(dir.hashCode)
    val base = graft.ScratchDirs.dir("bucketed", suffix)
    val ordersT = s"orders_bkt_$suffix"
    val lineitemT = s"lineitem_bkt_$suffix"
    // repartition on the bucket key first: the write then runs one task
    // per bucket (hash-aligned with bucketBy) instead of single-file
    // tasks each sorting and emitting all 8 buckets
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .repartition(8, col("o_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders").saveAsTable(ordersT)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/lineitem").saveAsTable(lineitemT)
    spark.table(lineitemT)
      .hint("merge")
      .join(spark.table(ordersT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
  }

  /** Two-phase SALTED aggregation (net-new): the standard defense when
    * a groupBy key is heavily skewed — e.g. counting per event_type
    * when one type dominates the stream. Phase 1 aggregates on
    * (key, salt) so the hot key's partials spread over `Salts`
    * reducers; phase 2 combines the per-salt partials on the now-tiny
    * keyspace. Every aggregate here must be decomposable
    * (count→sum, sum→sum, max→max); the result is bit-identical to the
    * direct groupBy, which is exactly what the oracle checks. At this
    * SF the direct plan is fine — the query pins the TECHNIQUE's
    * correctness so the 100 TB form is a constant change. */
  def saltedSkewAgg(spark: SparkSession, dir: String): DataFrame = {
    val Salts = 16
    val salted = Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(Salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"), max(col("value")).as("pmax"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("psum")), 6).as("sum_value"),
        round(max(col("pmax")), 6).as("max_value"))
  }

  /** Bloom-pruned semi-join (net-new): the J2 semi-join scale path when
    * the dimension key set is too large to inline as literals and the
    * planner won't broadcast it. A Bloom filter over the dim keys is
    * built with ONE aggregate (Spark's own runtime-filter bloom,
    * surfaced as `bloom_filter_agg`), ships to every fact task as a
    * scalar subquery, and prunes the fact SCAN-side before the shuffle
    * — at 100 TB this drops the shuffled volume to the semi-join's
    * selectivity. Bloom false positives are removed by the exact
    * semi-join on the survivors, so the result is bit-identical to the
    * plain semi-join the oracle runs. (Spark's AQE injects this rewrite
    * itself when stats justify it; the explicit form pins the
    * technique and works on any plan.) */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.Functions.register(spark) // session-scoped, idempotent
    val sfx = java.lang.Integer.toHexString(dir.hashCode)
    Tables.lineitem(spark, dir).createOrReplaceTempView(s"lineitem_bloom_$sfx")
    Tables.orders(spark, dir).createOrReplaceTempView(s"orders_bloom_$sfx")
    spark.sql(s"""
      WITH pruned AS (
        SELECT l_orderkey, l_returnflag, l_extendedprice
        FROM lineitem_bloom_$sfx
        WHERE bloom_might_contain(
          (SELECT bloom_filter_agg(xxhash64(o_orderkey), 150000L, 1200000L)
           FROM orders_bloom_$sfx WHERE o_orderstatus = 'F'),
          xxhash64(l_orderkey)))
      SELECT l_returnflag, count(*) AS n_items,
             round(sum(l_extendedprice), 2) AS sum_price
      FROM pruned
      WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders_bloom_$sfx WHERE o_orderstatus = 'F')
      GROUP BY l_returnflag""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_colocated_join" -> (bucketedColocatedJoin _),
    "salted_skew_agg"         -> (saltedSkewAgg _),
    "bloom_semi_join"         -> (bloomSemiJoin _),
  )

  val oracle: Map[String, String] = Map(
    "bucketed_colocated_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
       "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY o_orderpriority"),
    "salted_skew_agg" ->
      ("SELECT event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value, " +
       "round(max(value), 6) AS max_value FROM events GROUP BY event_type"),
    "bloom_semi_join" ->
      ("SELECT l_returnflag, count(*) AS n_items, round(sum(l_extendedprice), 2) AS sum_price " +
       "FROM lineitem WHERE l_orderkey IN " +
       "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') " +
       "GROUP BY l_returnflag"),
  )
}
