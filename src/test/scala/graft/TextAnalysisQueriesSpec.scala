package graft

import graft.queries.TextAnalysisQueries
import org.apache.spark.sql.functions._

class TextAnalysisQueriesSpec extends SparkSpecBase {

  test("every text-analysis query runs non-empty on the smoke SF") {
    TextAnalysisQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("token counts: regex tokens >= whitespace tokens on punctuated text") {
    import spark.implicits._
    val df = Seq(("x", "hello, world! 42 times")).toDF("id", "text")
    df.createOrReplaceTempView("tmp_tc")
    val toks = df.select(
      size(split(col("text"), " ")).as("ws"),
      size(regexp_extract_all(col("text"), lit(TextAnalysisQueries.TokenRegex), lit(0))).as("re"))
      .collect().head
    assert(toks.getInt(0) == 4)
    assert(toks.getInt(1) == 6) // hello , world ! 42 times
  }

  test("quality bands are exhaustive and ratios in [0,1]") {
    val df = TextAnalysisQueries.taQualityScore(spark, sfDir).cache()
    val bad = df.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
      col("punct_ratio") < 0 || col("punct_ratio") > 1).count()
    assert(bad == 0)
    val bands = df.select("quality_band").distinct().collect().map(_.getString(0)).toSet
    assert(bands.subsetOf(Set("high", "medium", "low")))
    df.unpersist()
  }

  test("lang-id prediction is deterministic and covers all docs") {
    val df = TextAnalysisQueries.taLangId(spark, sfDir)
    assert(df.count() == Tables.documents(spark, sfDir).count())
    val preds = df.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "es", "de", "und")))
  }

  test("winnowing fingerprints: near-dup docs share most fingerprint hashes") {
    val fp = TextAnalysisQueries.winnowFingerprints(spark, sfDir)
      .select("doc_id", "fingerprint").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val nearDups = graft.queries.DedupQueries.dedupNgramJaccard(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val overlaps = nearDups.toSeq.flatMap { case (a, b) =>
      for (fa <- fp.get(a); fb <- fp.get(b))
        yield fa.intersect(fb).size.toDouble / math.max(1, math.min(fa.size, fb.size))
    }
    assert(overlaps.nonEmpty && overlaps.sum / overlaps.size >= 0.5,
      f"mean fingerprint overlap ${overlaps.sum / overlaps.size}%.2f")
  }
}
