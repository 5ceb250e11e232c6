package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k (score, id) buffer: min-heap on the TOTAL order
  * (score desc, id asc) — root is the current worst pair, so `a` is
  * kept over root iff a.score > root.score, or equal score with a
  * smaller id. O(k) memory per group regardless of group size: the
  * scale-safe replacement for `row_number().over(Window.partitionBy(g)
  * .orderBy(score.desc, id.asc)) <= k`, which must SORT every group
  * (a full shuffle + per-group sort of all N rows, vs k-row partial
  * buffers map-side here).
  */
final class TopKPairsBuffer(val k: Int) {
  val score = new Array[Double](k)
  val id = new Array[Long](k)
  var size = 0

  // true iff (s1,i1) ranks WORSE than (s2,i2) under (score desc, id asc).
  // NaN ranks BEST: Spark's double ordering (and DuckDB's) places NaN
  // above every finite value, so a desc sort puts it first — the raw
  // </== form would leave NaN incomparable and make admission depend
  // on partition merge order. -0.0 == 0.0 stays primitive (Spark's
  // normalized comparison), so only the NaN arm special-cases.
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1); val n2 = java.lang.Double.isNaN(s2)
    if (n1 || n2) { if (n1 == n2) i1 > i2 else n2 }
    else s1 < s2 || (s1 == s2 && i1 > i2)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = score(a); score(a) = score(b); score(b) = ts
    val ti = id(a); id(a) = id(b); id(b) = ti
  }

  def insert(s: Double, i: Long): Unit = {
    if (size < k) {
      score(size) = s; id(size) = i; size += 1
      var c = size - 1 // sift up: parent must rank worse than its children
      while (c > 0 && worse(score(c), id(c), score((c - 1) / 2), id((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (worse(score(0), id(0), s, i)) {
      score(0) = s; id(0) = i
      var c = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < size && worse(score(l), id(l), score(m), id(m))) m = l
        if (r < size && worse(score(r), id(r), score(m), id(m))) m = r
        if (m == c) done = true else { swap(c, m); c = m }
      }
    }
  }

  /** (score, id) pairs sorted best-first: (score desc, id asc). */
  def sortedPairs: Array[(Double, Long)] =
    (0 until size).map(i => (score(i), id(i))).toArray
      .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
}

/** topk_pairs(score, id, k): array<struct<score,id>> of the k best
  * pairs per group, ordered (score desc, id asc). The aggregate form
  * of per-key top-k: partial buffers carry at most k pairs into the
  * shuffle, so the exchange is O(groups·k), independent of input rows.
  */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(b: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsBuffer, o: TopKPairsBuffer): TopKPairsBuffer = {
    var i = 0
    while (i < o.size) { b.insert(o.score(i), o.id(i)); i += 1 }
    b
  }

  override def eval(b: TopKPairsBuffer): Any =
    new GenericArrayData(b.sortedPairs.map { case (s, i) => InternalRow(s, i) })

  override def serialize(b: TopKPairsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) { out.writeDouble(b.score(i)); out.writeLong(b.id(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKPairsBuffer(k)
    (0 until n).foreach(_ => b.insert(in.readDouble(), in.readLong()))
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk_pairs"
}

object topkpairs {
  def topk_pairs(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairs(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
