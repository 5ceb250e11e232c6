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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_colocated_join" -> (bucketedColocatedJoin _),
  )

  val oracle: Map[String, String] = Map(
    "bucketed_colocated_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
       "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY o_orderpriority"),
  )
}
