package graft

import graft.queries.OlapQueries
import org.apache.spark.sql.functions._

class OlapQueriesSpec extends SparkSpecBase {

  test("every olap query runs non-empty on the smoke SF") {
    OlapQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("rollup covers detail, subtotal, and grand-total levels") {
    val df = OlapQueries.olapRollupOrders(spark, sfDir).cache()
    val grand = df.filter(col("priority") === "ALL" && col("status") === "ALL")
    assert(grand.count() == 1)
    val total = grand.collect().head.getAs[Long]("n_orders")
    assert(total == Tables.orders(spark, sfDir).count())
    // per-priority subtotals sum to the grand total
    val sub = df.filter(col("priority") =!= "ALL" && col("status") === "ALL")
      .agg(sum("n_orders")).collect().head.getLong(0)
    assert(sub == total)
    df.unpersist()
  }

  test("cube emits all four grouping sets") {
    val df = OlapQueries.olapCubeLineitem(spark, sfDir).cache()
    val sets = df.select(
      (col("returnflag") === "ALL").as("rf_all"),
      (col("linestatus") === "ALL").as("ls_all"))
      .distinct().count()
    assert(sets == 4, "expected detail, two marginals, and grand total")
    df.unpersist()
  }

  test("pivot counts match the unpivoted aggregate") {
    val piv = OlapQueries.olapPivotStatus(spark, sfDir)
      .agg(sum(col("n_open") + col("n_finished") + col("n_pending")))
      .collect().head.getLong(0)
    assert(piv == Tables.orders(spark, sfDir).count())
  }

  test("hash sample is deterministic and near the nominal rate") {
    val total = Tables.lineitem(spark, sfDir).count().toDouble
    val a = OlapQueries.xSampleHash(spark, sfDir)
      .agg(sum("n_rows")).collect().head.getLong(0)
    val b = OlapQueries.xSampleHash(spark, sfDir)
      .agg(sum("n_rows")).collect().head.getLong(0)
    assert(a == b, "same subset every run")
    // md5 hex first char in 0-9a-f: ascii%4==0 keeps {0,4,8,d} → 4/16
    assert(math.abs(a / total - 0.25) < 0.05, s"rate ${a / total}")
  }

  test("sample filter evaluates scan-side (below every exchange)") {
    val df = OlapQueries.xSampleHash(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the md5 predicate must evaluate in the scan stage: the Filter
    // node sits directly over the file scan, never above an Exchange
    // (the exchanges present belong to the distinct-aggregate, which
    // runs on already-filtered rows)
    val filterIdx = plan.indexOf("Filter")
    val lastExchangeIdx = plan.lastIndexOf("Exchange")
    assert(filterIdx >= 0, plan)
    // plan prints top-down: scan-side filter appears AFTER (deeper
    // than) every exchange in the string
    assert(filterIdx > lastExchangeIdx, plan)
  }
}
