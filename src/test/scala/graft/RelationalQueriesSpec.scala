package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkSpecBase {

  test("every relational query runs non-empty on the smoke SF") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every relational query with an oracle has matching column names") {
    // the driver's compare sorts columns by name; a drifting alias breaks
    // the hash even when values agree — pin the Spark-side schema here.
    val expected = Map(
      "q1_pricing_summary" -> Seq("l_returnflag", "l_linestatus", "sum_qty",
        "sum_base_price", "sum_disc_price", "avg_qty", "count_order"),
      "q3_shipping_priority" -> Seq("l_orderkey", "o_orderpriority", "revenue"),
      "q5_local_supplier_volume" -> Seq("n_name", "revenue"),
      "f1_project_filter" -> Seq("order_key", "part_key"),
    )
    expected.foreach { case (name, cols) =>
      val got = RelationalQueries.queries(name)(spark, sfDir).columns.toSeq
      assert(got == cols, s"$name schema drift: $got")
    }
  }

  test("j1 broadcast join avoids fact-side shuffle") {
    val plan = RelationalQueries.j1DimJoinDistinct(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$plan")
  }

  test("f1 pushes filter and projection into the parquet scan") {
    val plan = RelationalQueries.f1ProjectFilter(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_returnflag:string>"),
      s"columns not pruned:\n$plan")
  }

  test("w1 top-k plans as TakeOrdered (no global sort)") {
    val plan = RelationalQueries.w1TopkSort(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
  }

  test("dedup keep-first is deterministic across reruns") {
    val a = RelationalQueries.a3DedupKeepFirst(spark, sfDir).collect().toSet
    val b = RelationalQueries.a3DedupKeepFirst(spark, sfDir).collect().toSet
    assert(a == b)
  }

  test("q1 aggregates match a hand-computed group") {
    val row = RelationalQueries.q1PricingSummary(spark, sfDir)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F").collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("count_order") > 0)
  }

  test("q18 plans a TakeOrderedAndProject and respects the threshold") {
    val df = RelationalQueries.q18LargeVolume(spark, sfDir)
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(_.getDouble(3) > 250.0))
    // descending by sum_qty with orderkey tiebreak
    val qtys = rows.map(_.getDouble(3))
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a >= b })
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"limit+sort not fused:\n$plan")
  }

  test("correlated scalar subquery decorrelates to one aggregate + join") {
    val df = RelationalQueries.xCorrelatedSubquery(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"subquery must decorrelate:\n$optimized")
    assert(optimized.contains("Aggregate") && optimized.contains("Join"),
      s"expected aggregate+join rewrite:\n$optimized")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // spot-check the semantics against a hand-computed relation
    val avgByCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(round(lit(2) * avg(col("o_totalprice")), 2).as("thr"))
    val expect = Tables.orders(spark, sfDir).join(avgByCust, "o_custkey")
      .filter(col("o_totalprice") > col("thr")).count()
    assert(rows.length.toLong == expect)
  }

  test("q9 star join broadcasts every dimension; only the fact-fact join shuffles") {
    val df = RelationalQueries.q9ProductTypeProfit(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"part/supplier/nation must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") ||
      "SortMergeJoin".r.findAllIn(plan).size <= 1,
      s"only lineitem-orders may shuffle-join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) > 0))
    // every (nation, year) cell is distinct
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("observe metrics ride the single production pass and equal a direct recompute") {
    val row = graft.queries.RelationalQueries.xObserveMetrics(spark, sfDir).collect()(0)
    val l = Tables.lineitem(spark, sfDir)
    assert(row.getAs[Long]("n_scanned") == l.count())
    val want = l.filter(col("l_returnflag") === "R")
      .agg(count(lit(1)), round(sum(col("l_quantity")), 2),
        round(max(col("l_extendedprice")), 2)).collect()(0)
    assert(row.getAs[Long]("n_filtered") == want.getLong(0))
    assert(row.getAs[Double]("sum_qty") == want.getDouble(1))
    assert(row.getAs[Double]("max_price") == want.getDouble(2))
  }
}
