package graft

import graft.expr.{AhoCorasick, mcfunctions}
import graft.plans.MultiContainsRewrite
import org.apache.spark.sql.functions._

class MultiContainsSpec extends SparkSpecBase {

  test("aho-corasick automaton matches exactly the contained patterns") {
    val ac = new AhoCorasick(Seq("rotenone", "piericidin", "metformin"))
    assert(ac.matchesAny("effects of ROTENONE on complex I"))
    assert(ac.matchesAny("co-treatment piericidin-a analog"))
    assert(!ac.matchesAny("no inhibitors here"))
    assert(!ac.matchesAny(""))
    // overlapping/suffix patterns
    val ac2 = new AhoCorasick(Seq("he", "she", "hers"))
    assert(ac2.matchesAny("xshex"))
    assert(ac2.matchesAny("hers"))
    assert(!ac2.matchesAny("hr ex s"))
  }

  test("expression agrees with the exists(contains) form on real data") {
    val pats = graft.queries.TextQueries.antiPatterns
    val docs = Tables.documents(spark, sfDir)
    val viaExists = docs.filter(
      !exists(array(pats.map(lit): _*), p => lower(col("text")).contains(p)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaAc = docs.filter(!mcfunctions.multi_contains_any(col("text"), pats))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaExists == viaAc)
  }

  test("non-ASCII haystacks keep parity with Spark's lower+contains semantics") {
    // reference = Spark's OWN lower()+contains over a DataFrame — the
    // exact form the optimizer rewrite replaces — so expansion cases
    // like dotted-I are pinned against the real (ICU-backed) kernel
    import spark.implicits._
    val pats = Seq("it", "rot", "k9", "a b")
    val alphabet = "ItRoK9ab \u00c9\u00df\u03bb\u0418\u4e2d\ud83c\udf0d\u0130\u212a" // incl. dotted-\u0130 and Kelvin-K
    val rnd = new scala.util.Random(7)
    val cases = (Seq.tabulate(2000) { _ =>
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "\u0130t", "it", "\u212a9", "na\u00efve rot", "a\ud83c\udf0db", "a b")).distinct
    val df = cases.toDF("text").persist()
    val viaExists = df.filter(
      exists(array(pats.map(lit): _*), p => lower(col("text")).contains(p)))
      .collect().map(_.getString(0)).toSet
    val viaAc = df.filter(mcfunctions.multi_contains_any(col("text"), pats))
      .collect().map(_.getString(0)).toSet
    df.unpersist()
    assert(viaExists == viaAc,
      s"only-exists=${(viaExists -- viaAc).take(3)} only-ac=${(viaAc -- viaExists).take(3)}")
    // non-ASCII patterns are rejected outright, never silently aliased
    intercept[IllegalArgumentException](new AhoCorasick(Seq("café")))
  }

  test("rewrite rule leaves uppercase and empty literals untouched") {
    // contains(lower(x), 'IT') is constant-false and contains(x, '')
    // constant-true — the automaton lowercases / drops them, so firing
    // would change results; the rule must skip such chains
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MultiContainsRewrite
    try {
      Seq("IT", "").foreach { bad =>
        val df = Tables.documents(spark, sfDir).filter(
          lower(col("text")).contains("vector") ||
          lower(col("text")).contains(bad) ||
          lower(col("text")).contains("window"))
        assert(!df.queryExecution.optimizedPlan.toString.contains("multi_contains_any"),
          s"rule fired on literal '$bad'")
      }
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MultiContainsRewrite)
    }
  }

  test("rewrite rule leaves OR-chains with non-ASCII literals untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MultiContainsRewrite
    try {
      val df = Tables.documents(spark, sfDir).filter(
        lower(col("text")).contains("vector") ||
        lower(col("text")).contains("café") ||
        lower(col("text")).contains("window"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("multi_contains_any"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MultiContainsRewrite)
    }
  }

  test("optimizer rule collapses a 3+ branch contains OR-chain") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MultiContainsRewrite
    try {
      val df = Tables.documents(spark, sfDir).filter(
        lower(col("text")).contains("vector") ||
        lower(col("text")).contains("dup") ||
        lower(col("text")).contains("window"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("multi_contains_any"), optimized)
      // and the rewritten plan returns the same rows as the unrewritten OR
      val expected = Tables.documents(spark, sfDir).collect().count { r =>
        val t = r.getAs[String]("text").toLowerCase
        t.contains("vector") || t.contains("dup") || t.contains("window")
      }
      assert(df.count() == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MultiContainsRewrite)
    }
  }

  test("two-branch OR is left untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MultiContainsRewrite
    try {
      val df = Tables.documents(spark, sfDir).filter(
        lower(col("text")).contains("vector") || lower(col("text")).contains("dup"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("multi_contains_any"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MultiContainsRewrite)
    }
  }
}
