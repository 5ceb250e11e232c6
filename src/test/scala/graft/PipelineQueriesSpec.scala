package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

class PipelineQueriesSpec extends SparkSpecBase {

  test("curation funnel counts are monotone non-increasing stage to stage") {
    val r = PipelineQueries.e2eCurateCorpus(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val counts = Seq("n_input", "n_lang_ok", "n_quality_ok", "n_unique",
      "n_not_neardup", "n_final").map(c => row.getLong(row.fieldIndex(c)))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $counts")
    assert(counts.head > 0 && counts.last > 0, s"degenerate funnel: $counts")
    // every stage must actually filter somewhere across the whole funnel
    assert(counts.last < counts.head, "funnel filtered nothing")
  }

  test("curation funnel n_input matches the documents row count") {
    val row = PipelineQueries.e2eCurateCorpus(spark, sfDir).collect().head
    assert(row.getLong(row.fieldIndex("n_input")) ==
      Tables.documents(spark, sfDir).count())
  }

  test("e2e finalize emits valid confidence bins and known-union rows") {
    val df = PipelineQueries.e2eFinalize(spark, sfDir).cache()
    val bins = df.select("confidence_pubmed").distinct()
      .collect().map(_.getString(0)).toSet
    assert(bins.subsetOf(Set("very-low", "low", "medium", "high")))
    assert(df.filter(col("known_status") === "known").count() == 2)
    // known rows carry the reference's count boost of 100
    assert(df.filter(col("known_status") === "known" &&
      col("pubmed_references") === 100).count() == 2)
    df.unpersist()
  }
}
