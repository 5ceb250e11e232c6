package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string-similarity kernel (static, codegen-callable —
  * same pattern as [[TextHash]]). Semantics pinned to the COMMON
  * parameterization that DuckDB's `jaro_winkler_similarity` also
  * implements (verified against it on pinned vectors, see
  * KernelProps):
  *   - match window `max(|a|,|b|)/2 - 1` (so "ab"/"ba" → 0.0),
  *   - transpositions = matched-but-misordered count / 2 (integer),
  *   - Winkler boost `+ l·0.1·(1−jaro)` with prefix l capped at 4,
  *     applied only when jaro > 0.7.
  * Operates on Unicode code points (not UTF-16 units), matching the
  * engines' code-point semantics for supplementary characters. */
object StringSim {

  val WinklerPrefixMax = 4
  val WinklerBoostThreshold = 0.7
  val WinklerScale = 0.1

  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && b(j) == a(i)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= WinklerBoostThreshold) return jaro
    var l = 0
    val lmax = math.min(WinklerPrefixMax, math.min(la, lb))
    while (l < lmax && a(l) == b(l)) l += 1
    jaro + l * WinklerScale * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` — codegen'd Jaro–Winkler similarity (kernel
  * and parameter rationale in [[StringSim.jaroWinkler]]); the fuzzy
  * record-linkage scorer whose DuckDB builtin twin makes the whole
  * fuzzy-join oracle-checkable. */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.StringSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

object stringfunctions {
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSim(Bridge.expression(a), Bridge.expression(b)))
}
