package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Recall contract for the fuzzy joins' prefix/deletion-neighborhood
  * blocking: the typo corpus is built by single-char deletion, so every
  * input's SOURCE name sits at levenshtein distance ≤ 1 — if the
  * blocking ever dropped the source pair, that input's best distance
  * would jump to ≥ 2 or the row would vanish. Also pins the plan shape
  * (equi-join on the blocking key against a broadcast dict — no θ-join
  * fallback to BroadcastNestedLoopJoin). */
class FuzzyJoinSpec extends SparkSpecBase {

  test("levenshtein join: one row per typo, best distance <= 1 (blocking recall)") {
    val res = TextQueries.fuzzyJoinLevenshtein(spark, sfDir)
    val rows = res.collect()
    val nTypos = Tables.part(spark, sfDir).count()
    assert(rows.length == nTypos, s"${rows.length} rows for $nTypos typos")
    val worst = rows.map(_.getLong(3)).max
    assert(worst <= 1L, s"blocking lost a source pair: max dist $worst")
  }

  test("jw join: every matched score clears the threshold and source recall holds") {
    val res = TextQueries.fuzzyJoinJw(spark, sfDir).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getDouble(3) >= TextQueries.JwThreshold))
  }

  test("blocking is an equi-join on a broadcast dict (no nested-loop θ-join)") {
    val plan = TextQueries.fuzzyJoinJw(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"blocking degenerated to a nested loop:\n$plan")
  }
}
