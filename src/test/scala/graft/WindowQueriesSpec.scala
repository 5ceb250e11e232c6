package graft

import graft.queries.WindowQueries
import org.apache.spark.sql.functions._

class WindowQueriesSpec extends SparkSpecBase {

  test("every window query runs non-empty on the smoke SF") {
    WindowQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("rank top3 keeps at most 3 rows per user and ranks correctly") {
    val df = WindowQueries.winRankTop3(spark, sfDir)
    val over = df.groupBy("user_id").count().filter(col("count") > 3).count()
    assert(over == 0)
    // rank 1 value >= rank 2 value within a user
    val bad = df.as("a").join(df.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.rnk") < col("b.rnk") &&
        col("a.value") < col("b.value")).count()
    assert(bad == 0)
  }

  test("sessions respect the 30-minute gap invariant") {
    val df = WindowQueries.winSessionize(spark, sfDir).cache()
    // no two sessions of the same user overlap or sit closer than the gap
    val tooClose = df.as("a").join(df.as("b"),
      col("a.user_id") === col("b.user_id") &&
      col("a.session_end") < col("b.session_start") &&
      col("b.session_start").cast("long") - col("a.session_end").cast("long") <= 30L * 60).count()
    assert(tooClose == 0, "adjacent sessions closer than the inactivity gap")
    // session count per user matches dense per-user event total
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    df.unpersist()
  }

  test("per-user window ops shuffle exactly once") {
    val plan = WindowQueries.winMovingAvg(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("bucketed range join is an equi-join (no cartesian, no nested loop)") {
    val df = WindowQueries.rangeJoinBucketed(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
    // results match a brute-force inequality join
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"), unix_micros(col("ts")).as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("cts"))
    val brute = p.join(c, col("pu") === col("cu") &&
        col("cts") >= col("pts") - 3600L * 1000000L && col("cts") < col("pts"))
      .groupBy(col("pid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute, s"bucketed=${got.size} brute=${brute.size}")
  }

  test("custom top-k operator plans to TopKPerKeyExec over one exchange") {
    val df = WindowQueries.topkCustomOp(spark, sfDir)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerKey"), plan) // exec node prints without the Exec suffix
    // EnsureRequirements supplies exactly the clustered-by-key exchange
    assert("""Exchange hashpartitioning\(user_id""".r.findFirstIn(plan).isDefined, plan)
    // no full sort anywhere: bounded heaps replace the window's sort
    assert(!plan.contains("Sort "), plan)
    // per-group cardinality: never more than k rows per user
    import org.apache.spark.sql.functions.{col, count, max}
    val worst = df.groupBy(col("user_id")).agg(count(col("event_id")).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(worst <= 3)
  }

  test("tumbling windows partition the event stream exactly") {
    val df = WindowQueries.winTumblingHour(spark, sfDir)
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("sliding windows double-count each event (1h window, 30m slide)") {
    val df = WindowQueries.winSlidingHour(spark, sfDir)
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == 2 * Tables.events(spark, sfDir).count())
  }
}
