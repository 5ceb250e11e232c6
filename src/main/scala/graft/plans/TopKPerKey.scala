package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Whole-operator extension (the (c) rung of the custom-operator
  * ladder: LogicalPlan + SparkStrategy + SparkPlan): TOP-K PER KEY with
  * bounded state.
  *
  * The built-in formulation — `row_number().over(partitionBy(key)
  * .orderBy(o)) <= k` — must SORT every group in full: one exchange
  * plus an O(n log n) sort whose state is ALL rows of the partition.
  * This operator keeps only a k-row heap per key (O(keys·k) state,
  * O(n log k) work) and emits each group's top rows directly — at
  * 100 TB the difference is sorting the corpus vs streaming it once.
  * The aggregate form (`topk_pairs`) achieves the same bound for
  * *paired columns*; this operator returns WHOLE ROWS, which the
  * aggregate cannot without packing every column into the heap value.
  *
  * Distribution: the exec declares `ClusteredDistribution(keys)`, so
  * EnsureRequirements plans the single hash exchange — Catalyst picks
  * the partitioning; the operator never shuffles by hand. Rows within
  * a group are emitted in heap order (unordered); callers wanting
  * ranked output sort the (tiny) result.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // rank order: first under `ord` = rank 1. The heap's max (under
      // ord) is the WORST kept row — the eviction candidate.
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(sortOrder, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kLocal) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap(_._2.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKeyOp {
  /** Top `k` whole rows per key group, ranked by `order` (pass
    * `col.desc`/`col.asc`; bare columns default ascending). Installs
    * the planner strategy on the session if absent.
    *
    * Custom logical nodes don't get generic column resolution, so the
    * key/order expressions are resolved by round-tripping them through
    * the analyzer against the SAME analyzed child (select/sort), which
    * keeps attribute exprIds aligned. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val child = df.queryExecution.analyzed
    val keyExprs = df.select(keys: _*).queryExecution.analyzed match {
      case Project(projectList, _) => projectList.map {
        case Alias(e, _) => e
        case e => e
      }
      case other => throw new IllegalArgumentException(s"unexpected key plan: $other")
    }
    val sortOrders = df.sort(order: _*).queryExecution.analyzed
      .collectFirst { case s: Sort => s.order }
      .getOrElse(throw new IllegalArgumentException("order columns did not analyze to a Sort"))
    Bridge.ofRows(spark, TopKPerKey(keyExprs, sortOrders, k, child))
  }
}
