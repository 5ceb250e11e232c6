package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Plan lint over the WHOLE registered query surface: sweeps every
  * `SparkEntry.queries` entry and rejects plan shapes that break the
  * engine's scale promises. A future query that quietly reaches for a
  * UDF fails here, not in a 100 TB profile.
  *
  * Building each query executes its staging side effects (feed copies,
  * bucketed writes, streaming drains) at the smoke SF — that is the
  * point: the lint sees the exact plan the driver runs.
  */
class PlanLintSpec extends SparkSpecBase {

  test("no ScalaUDF in any registered query's optimized plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      val hasUdf = plan.exists(_.expressions.exists(_.exists {
        case _: ScalaUDF => true
        case _ => false
      }))
      // per-query persisted frames (shingle caches etc.) would otherwise
      // accumulate across the 131-query sweep — same hygiene as Verify
      spark.catalog.clearCache()
      if (hasUdf) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"UDF found in: $offenders — use a codegen'd Expression (graft.expr) instead")
  }

  test("no unfenced cartesian product in any registered query's physical plan") {
    // crossJoin against a BROADCAST side plans BroadcastNestedLoopJoin
    // (the big side streams, fine at scale); a CartesianProductExec
    // means BOTH sides shuffle into an O(N*M) join — only acceptable
    // inside the explicitly row-capped exact baselines.
    val fenced = Set("ann_neardup_pairs") // hard row cap asserted in its own spec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (fenced(name)) None
      else {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val hasCartesian = plan.exists {
          case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
          case _ => false
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        if (hasCartesian) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: $offenders — broadcast the small side or bucket-join")
  }

  test("no nested types (array/map/struct) in any registered query's result schema") {
    // The driver's pandas row-compare hashes every cell; ndarray/dict cells
    // are unhashable and crash the oracle harness (round-3 ta_inverted_index).
    // Convention: results ship scalars only — join collections to strings.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] => f.name
      }
      spark.catalog.clearCache()
      if (bad.nonEmpty) Some(s"$name(${bad.mkString(",")})") else None
    }
    assert(offenders.isEmpty,
      s"nested result columns in: $offenders — array_join/to_json to a scalar before returning")
  }
}
