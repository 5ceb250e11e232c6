package graft

import graft.queries.{SketchQueries, WindowQueries}
import org.apache.spark.sql.functions._

class SketchAsofSpec extends SparkSpecBase {

  test("HLL++ cardinality is within 5x rsd of exact; quantiles bracket the exact rank") {
    val exactByType = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val rows = SketchQueries.sketchCardinalityQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = exactByType(r.getString(0))
      assert(math.abs(approx - exact) / exact <= 5 * SketchQueries.Rsd,
        s"${r.getString(0)}: approx $approx vs exact $exact")
      assert(r.getAs[Double]("value_p50") <= r.getAs[Double]("value_p95"))
    }
    // quantile sanity on the full value column: p50 must split the data
    // within the sketch's rank-accuracy tolerance
    val e = Tables.events(spark, sfDir)
    val p50 = SketchQueries.sketchCardinalityQuantiles(spark, sfDir)
      .agg(min("value_p50")).collect().head.getDouble(0)
    val total = e.count().toDouble
    val below = e.filter(col("value") <= p50).count().toDouble
    assert(below / total > 0.05 && below / total < 0.95)
  }

  test("as-of join matches the brute-force greatest-earlier-click per purchase") {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("click_ts"))
    val brute = p.join(c, $"user_id" === $"cu" && $"click_ts" < $"purchase_ts", "left")
      .groupBy($"user_id", $"purchase_id", $"purchase_ts")
      .agg(max($"click_ts").as("asof_click_ts"))
      .collect().map(r => (r.getLong(1), Option(r.get(3)).map(_.toString))).toMap
    val fast = WindowQueries.asofJoinEvents(spark, sfDir)
      .collect().map(r => (r.getLong(1), Option(r.get(3)).map(_.toString))).toMap
    assert(fast.size == brute.size)
    assert(fast == brute)
  }

  test("bucketed co-located join plans a sort-merge join with NO exchange") {
    val df = graft.queries.ScaleQueries.bucketedColocatedJoin(spark, sfDir)
    val joinPlan = df.queryExecution.executedPlan.toString
    assert(joinPlan.contains("SortMergeJoin"), joinPlan)
    // the aggregation above the join still exchanges on the group key;
    // the JOIN subtree itself must not. Slice the plan at the join.
    val fromJoin = joinPlan.substring(joinPlan.indexOf("SortMergeJoin"))
    assert(!fromJoin.contains("Exchange"), fromJoin)
  }

  test("as-of join plans one exchange on user_id and no join operator") {
    val plan = WindowQueries.asofJoinEvents(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Exchange"), plan)
  }
}
