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
  // dense goto/fail tables over a 128-wide ASCII alphabet. PATTERNS must
  // be pure ASCII (enforced below; the optimizer rewrite only fires for
  // ASCII literals): a non-ASCII pattern char would alias with the
  // slot-0 reset and match haystack characters it shouldn't. HAYSTACKS
  // may contain anything — see matchesAny.
  require(patterns.forall(_.forall(_ < 128)),
    "AhoCorasick patterns must be pure ASCII")
  // ASCII-manual lowercase, NOT String.toLowerCase: the default-locale
  // mapping can leave the ASCII range (Turkish 'I' → U+0131) and then
  // index past the 128-wide tables below
  private val pats = patterns
    .map(_.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c))
    .filter(_.nonEmpty)
  private var goto_ : Array[Array[Int]] = _
  private var fail: Array[Int] = _
  private var out: Array[Boolean] = _
  build()

  private def build(): Unit = {
    val maxNodes = pats.map(_.length).sum + 1
    goto_ = Array.fill(maxNodes)(Array.fill(128)(-1))
    out = new Array[Boolean](maxNodes)
    var nodes = 1
    pats.foreach { p =>
      var s = 0
      p.foreach { c =>
        val ci: Int = c // pure ASCII by the constructor require
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

  /** True iff any pattern occurs in `text` (case-insensitive), with
    * EXACTLY the semantics of `contains(lower(text), pat)`: pure-ASCII
    * input takes the allocation-free fast path; any non-ASCII character
    * falls back to the full-Unicode path so the optimizer rewrite stays
    * semantics-preserving. */
  def matchesAny(text: String): Boolean = {
    if (pats.isEmpty) return false
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 128) return matchesAnySlow(text)
      s = goto_(s)(if (c >= 'A' && c <= 'Z') c + 32 else c)
      if (out(s)) return true
      i += 1
    }
    false
  }

  /** Non-ASCII path: lowercase the WHOLE string first — mirroring
    * Spark's `Lower` (UTF8String.toLowerCase delegates to
    * String.toLowerCase for non-ASCII input), whose mapping can EXPAND
    * (e.g. 'İ' → "i̇"); per-char Character.toLowerCase would match
    * patterns the contains() form does not. A non-ASCII char can never
    * be part of an (ASCII-only) pattern, so it resets the automaton to
    * the root — the exact longest-matching-prefix behavior, without
    * aliasing into slot 0. */
  private def matchesAnySlow(text: String): Boolean = {
    val lower = text.toLowerCase
    var s = 0
    var i = 0
    val n = lower.length
    while (i < n) {
      val c = lower.charAt(i)
      s = if (c < 128) goto_(s)(c) else 0
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
