package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Bounded top-k buffer: min-heap of the k largest values seen. O(k)
  * memory per group regardless of group size — the scale-safe form of
  * `slice(sort_array(collect_list(x), desc), 1, k)` (SURVEY §2.4 A5 /
  * §2.10 D6, finalize_realease.py:169-173), which buffers whole groups.
  */
final class TopKBuffer(val k: Int) {
  val heap = new Array[Double](k) // min-heap on heap(0)
  var size = 0

  // NaN-total greater-than: NaN ranks above every finite value (Spark's
  // and DuckDB's double ordering), so admission cannot depend on
  // arrival/merge order when a NaN appears; -0.0 == 0.0 stays primitive.
  @inline private def gt(a: Double, b: Double): Boolean = {
    val na = java.lang.Double.isNaN(a); val nb = java.lang.Double.isNaN(b)
    if (na || nb) na && !nb else a > b
  }

  def insert(v: Double): Unit = {
    if (size < k) {
      heap(size) = v; size += 1
      var i = size - 1 // sift up
      while (i > 0 && gt(heap((i - 1) / 2), heap(i))) {
        val t = heap(i); heap(i) = heap((i - 1) / 2); heap((i - 1) / 2) = t
        i = (i - 1) / 2
      }
    } else if (gt(v, heap(0))) {
      heap(0) = v
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && gt(heap(m), heap(l))) m = l
        if (r < size && gt(heap(m), heap(r))) m = r
        if (m == i) done = true
        else { val t = heap(i); heap(i) = heap(m); heap(m) = t; i = m }
      }
    }
  }

  def values: Array[Double] = heap.take(size)
}

/** topk_mean(x, k): mean of the k largest x per group. Values are
  * summed in descending order at eval for a deterministic result. */
case class TopKMean(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: org.apache.spark.sql.catalyst.InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    o.values.foreach(b.insert); b
  }

  override def eval(b: TopKBuffer): Any =
    if (b.size == 0) null
    else {
      val vs = b.values.sorted(Ordering[Double].reverse)
      var s = 0.0d; var i = 0
      while (i < vs.length) { s += vs(i); i += 1 }
      s / vs.length
    }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.values.foreach(out.writeDouble)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKBuffer(k)
    (0 until n).foreach(_ => b.insert(in.readDouble()))
    b
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKMean =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): TopKMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKMean =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk_mean"
}

object aggfunctions {
  def topk_mean(c: Column, k: Int): Column =
    Bridge.column(TopKMean(Bridge.expression(c), k).toAggregateExpression())
}
