package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with `m` counters (Misra &
  * Gries 1982; mergeable form per Agarwal et al. 2012, "Mergeable
  * summaries", PODS). Deterministic state bound O(m) per group —
  * unlike count–min (the engine's other frequency sketch,
  * [[graft.queries.SketchQueries.sketchHeavyHitters]]) the summary
  * needs no width×depth array and no driver-side probe: partials merge
  * map-side like any algebraic aggregate, and the merged summary
  * itself IS the candidate set.
  *
  * Guarantees after any update/merge tree: every tracked estimate
  * satisfies true − n/(m+1) ≤ est ≤ true, and any item with frequency
  * > n/(m+1) is guaranteed tracked. WHICH borderline items are tracked
  * (and their exact estimates) is merge-order-dependent, so queries
  * must emit only the order-independent claims: membership of
  * guaranteed-heavy items and the error-bound booleans.
  */
final class MGBuffer(val m: Int) {
  val counts = mutable.HashMap.empty[String, Long]

  /** Subtract `dec` from every counter and evict non-positives — the
    * step both the classic update and the Agarwal merge share. */
  private def decrementAll(dec: Long): Unit = {
    var rem = List.empty[String]
    counts.mapValuesInPlace((_, c) => c - dec)
    counts.foreach { case (k, c) => if (c <= 0) rem ::= k }
    rem.foreach(counts.remove)
  }

  def add(key: String, w: Long = 1L): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + w)
      case None if counts.size < m => counts.update(key, w)
      case None =>
        // classic decrement step: the new item and every counter give
        // up min(w, min count) occurrences; zeros evict
        val dec = math.min(w, counts.valuesIterator.min)
        decrementAll(dec)
        if (w > dec) add(key, w - dec)
    }
  }

  /** Agarwal et al. merge: sum keywise, then subtract the (m+1)-th
    * largest count from all and drop non-positives — restores the
    * counter bound while preserving the n/(m+1) error guarantee. */
  def mergeIn(o: MGBuffer): Unit = {
    o.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > m)
      decrementAll(counts.values.toArray.sorted(Ordering[Long].reverse)(m))
  }
}

/** misra_gries(key, m): array<struct<term, est>> of the tracked items,
  * sorted by term for a deterministic layout. */
case class MisraGries(child: Expression, m: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = { b.mergeIn(o); b }

  override def eval(b: MGBuffer): Any = {
    val sorted = b.counts.toArray.sortBy(_._1)
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    })
  }

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws
  // UTFDataFormatException past 65535 encoded bytes, and a
  // whitespace-split corpus can legitimately produce such a "token"
  override def serialize(b: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new MGBuffer(m)
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val c = in.readLong()
      b.counts.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), c)
    }
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGries =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "misra_gries"
}

object mgfunctions {
  def misra_gries(c: Column, m: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(c), m).toAggregateExpression())
}
