package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Layout robustness for the `events` loader: the driver has shipped
  * `events.ts` as parquet TIMESTAMP(NANOS) (read as long nanos under the
  * nanosAsLong conf) and as TIMESTAMP(MICROS) isAdjustedToUTC=false
  * (read as TIMESTAMP_NTZ) — a regen flip between the two once zeroed
  * 47 queries at once. This spec writes a tiny events fixture in BOTH
  * read-side layouts and asserts the loader normalizes each to the SAME
  * TimestampType column with the SAME internal micros, so a future
  * testdata regen cannot silently break the events surface again. */
class EventsLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private val baseMicros = 1717243200000000L // 2024-06-01 12:00:00 UTC
  private val rows = (1 to 6).map { i =>
    (i.toLong, baseMicros + i * 90L * 60 * 1000000, // 90-min spacing
      (i % 3).toLong, if (i % 2 == 0) "click" else "view", i * 1.5, "{}")
  }

  private def writeFixture(layout: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"events_$layout").toString
    val df = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = layout match {
      // the regenerated-driver layout: µs timestamp, isAdjustedToUTC=false
      case "ntz" => df.withColumn("ts",
        timestamp_micros(col("us")).cast(TimestampNTZType))
      // the legacy layout's READ-side shape: nanosAsLong surfaces
      // TIMESTAMP(NANOS) as a plain long-nanos column (Spark cannot
      // write TIMESTAMP(NANOS) itself, so the fixture writes the long
      // the loader actually sees)
      case "nanos_long" => df.withColumn("ts", col("us") * 1000L)
      // a session-TZ timestamp layout (isAdjustedToUTC=true)
      case "ltz" => df.withColumn("ts", timestamp_micros(col("us")))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val layouts = Seq("ntz", "nanos_long", "ltz")

  test("Tables.events normalizes every shipped ts layout to TimestampType") {
    layouts.foreach { layout =>
      val ev = Tables.events(spark, writeFixture(layout))
      assert(ev.schema("ts").dataType == TimestampType,
        s"layout=$layout must surface TimestampType")
    }
  }

  test("normalized micros are identical across layouts (UTC identity)") {
    val perLayout = layouts.map { layout =>
      layout -> Tables.events(spark, writeFixture(layout))
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val expected = rows.map(r => (r._1, r._2))
    perLayout.foreach { case (layout, got) =>
      assert(got == expected, s"layout=$layout micros drifted")
    }
  }

  test("an event-time query computes identically on every layout") {
    val results = layouts.map { layout =>
      val ev = Tables.events(spark, writeFixture(layout))
      graft.streaming.StreamOps.tumblingCounts(ev, "1 hour", "1 hour")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    assert(results.distinct.size == 1,
      "tumbling counts must not depend on the parquet ts layout")
    assert(results.head.nonEmpty)
  }

  test("normalizeTs leaves non-ts columns and pushdown intact") {
    // filters on other columns must still reach the scan in both layouts
    layouts.foreach { layout =>
      val ev = Tables.events(spark, writeFixture(layout))
        .filter(col("event_type") === "click").select("event_id", "ts")
      assert(ev.count() == rows.count(_._4 == "click"), s"layout=$layout")
      val plan = ev.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") || plan.contains("Filter"),
        s"layout=$layout plan lost its filter:\n$plan")
    }
  }
}
