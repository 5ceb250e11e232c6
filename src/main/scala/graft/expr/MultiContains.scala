package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Aho–Corasick multi-pattern containment (SURVEY §2.2 F6 / §4 rewrite
  * 2): `rg -F -i -f patterns` as ONE automaton pass over the input
  * instead of N independent `contains` probes. At 49 patterns (the
  * reference's inhibitor list) this is the difference between 49 scans
  * of every abstract and one.
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  // dense goto/fail tables over a 128-wide ASCII alphabet; non-ASCII
  // chars map to slot 0 (never part of a lowercase ASCII pattern).
  private val pats = patterns.map(_.toLowerCase).filter(_.nonEmpty)
  private var goto_ : Array[Array[Int]] = _
  private var fail: Array[Int] = _
  private var out: Array[Boolean] = _
  build()

  private def idx(c: Char): Int = if (c < 128) c else 0

  private def build(): Unit = {
    val maxNodes = pats.map(_.length).sum + 1
    goto_ = Array.fill(maxNodes)(Array.fill(128)(-1))
    out = new Array[Boolean](maxNodes)
    var nodes = 1
    pats.foreach { p =>
      var s = 0
      p.foreach { c =>
        val ci = idx(c)
        if (goto_(s)(ci) == -1) { goto_(s)(ci) = nodes; nodes += 1 }
        s = goto_(s)(ci)
      }
      out(s) = true
    }
    fail = new Array[Int](nodes)
    val q = scala.collection.mutable.Queue[Int]()
    (0 until 128).foreach { c =>
      if (goto_(0)(c) == -1) goto_(0)(c) = 0
      else { fail(goto_(0)(c)) = 0; q += goto_(0)(c) }
    }
    while (q.nonEmpty) {
      val s = q.dequeue()
      (0 until 128).foreach { c =>
        val t = goto_(s)(c)
        if (t != -1) {
          fail(t) = goto_(fail(s))(c)
          out(t) = out(t) || out(fail(t))
          q += t
        } else goto_(s)(c) = goto_(fail(s))(c)
      }
    }
  }

  /** True iff any pattern occurs in `text` (case-insensitive). */
  def matchesAny(text: String): Boolean = {
    if (pats.isEmpty) return false
    var s = 0
    var i = 0
    while (i < text.length) {
      s = goto_(s)(idx(Character.toLowerCase(text.charAt(i))))
      if (out(s)) return true
      i += 1
    }
    false
  }
}

/** `multi_contains_any(c, patterns)`: case-insensitive containment of
  * any fixed pattern, via a shared Aho–Corasick automaton referenced
  * from generated code. */
case class MultiContainsAny(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_contains_any requires a string argument, got ${child.dataType.catalogString}")

  @transient private lazy val automaton = new AhoCorasick(patterns)

  override def nullSafeEval(input: Any): Any =
    automaton.matchesAny(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("automaton", automaton, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ac.matchesAny($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContainsAny =
    copy(child = newChild)
  override def prettyName: String = "multi_contains_any"
}

object mcfunctions {
  def multi_contains_any(c: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiContainsAny(Bridge.expression(c), patterns))
}
