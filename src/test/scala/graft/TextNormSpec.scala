package graft

import graft.expr.TextNorm
import graft.ops.CleanText
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned vectors for the custom text-normalization kernels (SURVEY §2.7
  * X5/X8/X9) — the unicode edge cases the DuckDB oracle can't check. */
class TextNormSpec extends AnyFunSuite {

  test("X5 nfc composes combining sequences and is idempotent") {
    val decomposed = "étude" // e + combining acute
    assert(TextNorm.nfc(decomposed) == "étude")
    assert(TextNorm.nfc(TextNorm.nfc(decomposed)) == TextNorm.nfc(decomposed))
    assert(TextNorm.nfc("plain ascii") == "plain ascii")
    assert(TextNorm.nfc(null) == null)
  }

  test("X8 transliteration maps accents/punctuation and is ASCII-closed") {
    assert(TextNorm.asciiTranslit("étude") == "etude")
    assert(TextNorm.asciiTranslit("naïve café") == "naive cafe")
    assert(TextNorm.asciiTranslit("≥ 5 µM – ok") == ">= 5 uM - ok")
    assert(TextNorm.asciiTranslit("straße") == "strasse")
    // untranslatable → '?' like iconv //TRANSLIT
    assert(TextNorm.asciiTranslit("中") == "?")
    // closure: output of translit is always pure ASCII
    val out = TextNorm.asciiTranslit("é—“x”…°")
    assert(out.forall(_ < 128), out)
  }

  test("X9 compound normalization follows the reference rules") {
    assert(TextNorm.normalizeCompound("  Metformin  ") == "metformin")
    assert(TextNorm.normalizeCompound("rote-none") == "rotenone")
    // plural strip, unless us/is/os/gas suffix or len<=4
    assert(TextNorm.normalizeCompound("Widgets") == "widget")
    assert(TextNorm.normalizeCompound("Virus") == "virus")
    assert(TextNorm.normalizeCompound("Gas") == "gas")
    assert(TextNorm.normalizeCompound("Bis") == "bis")
    // idempotent
    val n = TextNorm.normalizeCompound("Some-Compound Names")
    assert(TextNorm.normalizeCompound(n) == n)
  }
}

/** Spark-side behavior of the text pack on the smoke SF. */
class TextQueriesSpec extends SparkSpecBase {

  test("every text query runs non-empty on the smoke SF") {
    TextQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("clean chain stays in one whole-stage-codegen projection") {
    val df = TextQueries.x1CleanChain(spark, sfDir)
    df.collect() // finalize AQE so codegen spans appear in the plan
    // AQE prints the initial plan after the final one — only the final
    // section reflects what actually ran
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the whole X1-X8 chain fuses into ONE codegen'd Project ("*(n)" is
    // the WholeStageCodegen marker); the only exchange is the loader's
    // scan redistribution (single-row-group input), nothing mid-chain
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert("""Exchange""".r.findAllIn(plan).size <= 1, plan)
  }

  test("custom expressions work through codegen on a DataFrame") {
    import spark.implicits._
    import graft.expr.functions._
    val df = Seq("étude", "Cafés", "plain").toDF("s")
      .select(transliterate_ascii(normalize_nfc(col("s"))).as("t"),
        normalize_compound(col("s")).as("n"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0)._1 == "etude")
    assert(rows(1)._1 == "Cafes")
    assert(rows(1)._2 == "café")
    assert(rows(2)._1 == "plain")
  }

  test("X10 paren truncation edge cases") {
    import spark.implicits._
    val df = Seq("keep (this)", "cut (frag", "none", "(all").toDF("s")
      .select(CleanText.parenTruncate(col("s")).as("t"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("keep (this)", "cut ", "none", ""))
  }

  test("X11 typo chain is order-sensitive (cascade)") {
    import spark.implicits._
    val df = Seq("blue widget kit").toDF("s")
      .select(CleanText.typoChain(col("s"), TextQueries.typoRules).as("t"))
    // widget→gadget, 'blue '→'', then gadget→device: cascades
    assert(df.collect().head.getString(0) == "device kit")
  }

  test("events loader exposes a usable microsecond timestamp") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType.typeName == "timestamp")
    val r = df.select(min(col("ts")).cast("string")).collect().head.getString(0)
    assert(r.startsWith("2024-"), r)
  }
}
