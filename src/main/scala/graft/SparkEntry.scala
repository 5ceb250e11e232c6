package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query over /root/testdata tables, with a DuckDB-equivalent `oracleSql`
  * where the semantics are ANSI-SQL-expressible (omitted entries get the
  * driver's weaker rows-only check).
  */
object SparkEntry {

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (WindowQueries.queries, WindowQueries.oracle),
      (SimilarityQueries.queries, SimilarityQueries.oracle),
      (DedupQueries.queries, DedupQueries.oracle),
      (TextAnalysisQueries.queries, TextAnalysisQueries.oracle),
      (SourceQueries.queries, SourceQueries.oracle),
      (EnrichQueries.queries, EnrichQueries.oracle),
      (MultimodalQueries.queries, MultimodalQueries.oracle),
      (PipelineQueries.queries, PipelineQueries.oracle),
      (StreamingQueries.queries, StreamingQueries.oracle),
      (SketchQueries.queries, SketchQueries.oracle),
      (ScaleQueries.queries, ScaleQueries.oracle),
      (OlapQueries.queries, OlapQueries.oracle),
      (CurationQueries.queries, CurationQueries.oracle),
      (ChemQueries.queries, ChemQueries.oracle),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q3ShippingPriority(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)
}
