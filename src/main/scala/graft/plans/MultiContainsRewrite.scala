package graft.plans

import graft.expr.MultiContainsAny
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (SURVEY §4 custom-work item 2): collapse an OR-chain
  * of case-insensitive literal containments over the same column —
  * `contains(lower(x), 'a') OR contains(lower(x), 'b') OR ...` — into
  * one [[MultiContainsAny]] automaton pass. Correctness-identical;
  * turns N substring scans per row into one. Fires only at 3+ branches
  * so simple 1–2 literal filters keep their codegen'd `contains`.
  */
object MultiContainsRewrite extends Rule[LogicalPlan] {

  // The rewrite must stay semantics-preserving, so a literal qualifies
  // only when the automaton treats it EXACTLY like contains(lower(x), lit):
  // - lowercase ASCII only: the dense tables are 128-wide (non-ASCII
  //   aliases), and an UPPERCASE literal can never match lowered text —
  //   contains() is constant-false there, while the automaton would
  //   lowercase the pattern and start matching;
  // - non-empty: contains(x, '') is constant-true, but the automaton
  //   drops empty patterns.
  // Chains with such literals keep their original contains() form.
  private def literalPattern(e: Expression): Option[(Expression, String)] = e match {
    case Contains(Lower(x), Literal(s: UTF8String, _))
        if s.toString.nonEmpty &&
          s.toString.forall(c => c < 128 && !(c >= 'A' && c <= 'Z')) =>
      Some((x, s.toString))
    case _ => None
  }

  /** Flatten an Or-tree of contains(lower(x), lit) on ONE column. */
  private def flatten(e: Expression): Option[(Expression, Seq[String])] = e match {
    case Or(l, r) =>
      (flatten(l), flatten(r)) match {
        case (Some((xl, pl)), Some((xr, pr))) if xl.semanticEquals(xr) =>
          Some((xl, pl ++ pr))
        case _ => None
      }
    case other => literalPattern(other).map { case (x, p) => (x, Seq(p)) }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case or: Or =>
        flatten(or) match {
          case Some((x, pats)) if pats.length >= 3 => MultiContainsAny(x, pats)
          case _ => or
        }
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` injector: the
  * MultiContains optimizer rule plus the library's SQL function surface
  * (also usable piecemeal via `spark.experimental.extraOptimizations`
  * and `graft.Functions.register`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => MultiContainsRewrite)
    graft.Functions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
  }
}
