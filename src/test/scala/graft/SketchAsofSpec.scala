package graft

import graft.queries.{SketchQueries, WindowQueries}
import org.apache.spark.sql.functions._

class SketchAsofSpec extends SparkSpecBase {

  test("sketch error-bound assertions hold and exact counts match a recompute") {
    // the query itself carries the error-bound checks as boolean
    // columns (that's what the oracle hash-verifies); here: every
    // bound holds and the exact side agrees with an independent
    // recomputation
    val rows = SketchQueries.sketchCardinalityQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exactByType = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_users_ok"), s"${r.getString(0)}: HLL++ outside 3*rsd")
      assert(r.getAs[Boolean]("p50_ok"), s"${r.getString(0)}: p50 outside rank envelope")
      assert(r.getAs[Boolean]("p95_ok"), s"${r.getString(0)}: p95 outside rank envelope")
      assert(r.getAs[Long]("exact_users") == exactByType(r.getString(0)))
    }
  }

  test("KMV jaccard: every pair covered, contract holds, estimate replays from a window-form signature") {
    val rows = SketchQueries.sketchKmvJaccard(spark, sfDir).collect()
    val types = Tables.events(spark, sfDir)
      .select(col("event_type")).distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2, s"expected all pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("kmv_ok"),
        s"KMV estimate outside ±${SketchQueries.KmvMargin}: $r")
      val (est, exact) = (r.getAs[Double]("est_jaccard"), r.getAs[Double]("exact_jaccard"))
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
    }
    // signature independence from the physical operator: the bounded-heap
    // TopKPerKey signatures must equal a row_number window replay
    import org.apache.spark.sql.expressions.Window
    val du = Tables.events(spark, sfDir)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h")).distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
    val windowSig = du.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SketchQueries.KmvK)
      .groupBy(col("event_type")).agg(sort_array(collect_list(col("h"))).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val opSig = graft.plans.TopKPerKeyOp(du, Seq(col("event_type")), Seq(col("h").asc), SketchQueries.KmvK)
      .groupBy(col("event_type")).agg(sort_array(collect_list(col("h"))).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(opSig == windowSig)
  }

  test("Misra-Gries: guarantees hold under different merge shapes, summary stays bounded") {
    import graft.expr.mgfunctions.misra_gries
    val rows = SketchQueries.sketchMgHeavyTokens(spark, sfDir).collect()
    assert(rows.nonEmpty, "no guaranteed-heavy tokens — threshold tuned wrong for the corpus")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_sketch"), s"guaranteed-heavy token missing from sketch: $r")
      assert(r.getAs[Boolean]("mg_ok"), s"MG estimate outside its error bound: $r")
    }
    // merge-order robustness: radically different partitionings (many
    // tiny partials vs one) must both satisfy the bound; summary <= m
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
    val n = toks.count()
    val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 17)) {
      val sk = toks.repartition(parts)
        .agg(misra_gries(col("w"), SketchQueries.MgM).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.size <= SketchQueries.MgM)
      val bound = n.toDouble / (SketchQueries.MgM + 1)
      sk.foreach { case (w, est) =>
        assert(est <= exact(w), s"overestimate for $w at parts=$parts")
        assert(exact(w) - est <= bound, s"error bound broken for $w at parts=$parts")
      }
      exact.filter(_._2 > bound).keys.foreach { w =>
        assert(sk.contains(w), s"guaranteed-heavy $w absent at parts=$parts")
      }
    }
  }

  test("Misra-Gries survives tokens longer than 64 KiB (length-prefixed buffer serialization)") {
    // writeUTF would throw UTFDataFormatException at 65536 encoded
    // bytes during partial-buffer serialization — the r5 ADVICE item
    import graft.expr.mgfunctions.misra_gries
    import spark.implicits._
    val big = "x" * 70000
    val df = (1 to 10).map(i => if (i % 2 == 0) big else "small").toDF("t").repartition(4)
    val byLen = df.agg(misra_gries(col("t"), 4).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est")).collect()
      .map(r => r.getString(0).length -> r.getLong(1)).toMap
    assert(byLen == Map(70000 -> 5L, 5 -> 5L), s"got $byLen")
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
