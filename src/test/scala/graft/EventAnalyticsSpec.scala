package graft

import graft.queries.{OlapQueries, SourceQueries}
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpecBase {

  test("funnel stages are ordered-monotone and bounded by user count") {
    val row = OlapQueries.funnelConversion(spark, sfDir).collect().head
    val Seq(users, view, click, full) = Seq("n_users", "n_view", "n_view_click",
      "n_full_funnel").map(c => row.getLong(row.fieldIndex(c)))
    assert(users >= view && view >= click && click >= full,
      s"funnel not monotone: $users $view $click $full")
    assert(users > 0 && view > 0, "degenerate funnel")
  }

  test("cohort retention: offset-0 cell equals each cohort's size") {
    val df = OlapQueries.cohortRetention(spark, sfDir).cache()
    // every user purchases on their own first-purchase day, so the
    // day_offset=0 row of each cohort must count the whole cohort
    val cohortSizes = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      .groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    val zeroCells = df.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users"))
    val mismatches = zeroCells.join(cohortSizes, "cohort_day")
      .filter(col("n_users") =!= col("n_cohort")).count()
    assert(mismatches == 0, "offset-0 retention cell diverges from cohort size")
    assert(df.filter(col("day_offset") < 0).count() == 0, "negative day offset")
    df.unpersist()
  }

  test("jsonl roundtrip preserves per-lang char totals exactly") {
    val rt = SourceQueries.s8JsonlRoundtrip(spark, sfDir)
    val direct = Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_len"))
    assert(rt.exceptAll(direct).isEmpty && direct.exceptAll(rt).isEmpty,
      "jsonl write->read drifted from the source table")
  }

  test("orc roundtrip read-back pushes the quantity filter to the scan") {
    val plan = SourceQueries.s9OrcRoundtrip(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_quantity.*"),
      s"quantity filter not pushed into the ORC scan:\n$plan")
  }
}
