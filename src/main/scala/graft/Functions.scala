package graft

import graft.expr._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface of the library's custom expressions: every custom
  * Catalyst expression is also callable from `spark.sql(...)`, either
  * by registering into an existing session (`Functions.register`) or
  * via `spark.sql.extensions=graft.plans.GraftExtensions` at session
  * build (which additionally installs the MultiContains optimizer
  * rule). Builders take SQL literals for the non-column parameters
  * (pattern lists, k).
  */
object Functions {

  private def str(e: Expression): String = e.eval() match {
    case s: UTF8String => s.toString
    case s: String => s
    case other => other.toString
  }
  private def int(e: Expression): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => other.toString.toInt
  }
  private def dbl(e: Expression): Double = e.eval() match {
    case d: Double => d
    case d: java.math.BigDecimal => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.toString.toDouble
  }

  /** name → builder over analyzed argument expressions. Aggregate
    * builders return the raw AggregateFunction; the analyzer wraps it. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "normalize_nfc"       -> (e => NormalizeNfc(e.head)),
    "transliterate_ascii" -> (e => TransliterateAscii(e.head)),
    "normalize_compound"  -> (e => NormalizeCompound(e.head)),
    "simhash64"           -> (e => SimHash64(e.head)),
    "poly61"              -> (e => PolyHash61(e.head)),
    "word_gram_poly61"    -> (e => WordGramPoly61(e(0), int(e(1)))),
    "dot_product"         -> (e => DotProduct(e(0), e(1))),
    "bit_tanimoto"        -> (e => BitTanimoto(e(0), e(1))),
    "bit_tversky"         -> (e => BitTversky(e(0), e(1), dbl(e(2)), dbl(e(3)))),
    "bit_dice"            -> (e => BitDice(e(0), e(1))),
    "multi_contains_any"  -> (e => MultiContainsAny(e.head, e.tail.map(str))),
    "jaro_winkler"        -> (e => JaroWinklerSim(e(0), e(1))),
    "cdc_boundaries"      -> (e => CdcBoundaries(e.head)),
    // bpe_apply_merges(word, a1, b1, a2, b2, ...): the whole ordered
    // merge table in one call — pairs as alternating literals
    "bpe_apply_merges"    -> (e => {
      val pairs = e.tail.map(str).grouped(2).map(p => (p(0), p(1))).toSeq
      BpeApplyMerges(e.head, pairs.map(_._1), pairs.map(_._2))
    }),
    "topk_mean"           -> (e => TopKMean(e(0), int(e(1)))),
    "topk_pairs"          -> (e => TopKPairs(e(0), e(1), int(e(2)))),
    // Spark's internal runtime-filter bloom pair, surfaced as SQL
    // functions: build a bloom over the dim keys (one aggregate), probe
    // it scan-side on the fact (scalar-subquery broadcast) — the J2
    // semi-join scale path when the key set outgrows a literal IN list.
    "bloom_filter_agg" -> (e =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(e(0), e(1), e(2))),
    "bloom_might_contain" -> (e =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(e(0), e(1))),
  )

  /** Register all functions into an existing session (temp functions,
    * session-scoped). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
}
