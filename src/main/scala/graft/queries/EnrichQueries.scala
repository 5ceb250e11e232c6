package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.enrich._

/** Enrichment-boundary pack: the D1 batched classifier and the S6/J5
  * dictionary-first lookup chain, run with deterministic in-engine
  * service stubs whose logic is SQL-expressible — so the operator
  * machinery (batching, fan-out, join chain, residual fetch) is what
  * the oracle actually checks.
  */
object EnrichQueries {

  /** D1: batched classify over documents; UDTF-shaped 1→0..3 fan-out
    * + F8-style confidence filter + X15-style id list per compound. */
  def d1ClassifyAggregate(spark: SparkSession, dir: String): DataFrame = {
    val results = ClassifyOp(spark, Tables.documents(spark, dir), "doc_id", "text",
      new RetryingClassifier(new DeterministicClassifier, sleep = _ => ()))
    // (id, compound) pairs are unique by construction (the classifier
    // emits DISTINCT names per doc), so count/collect_list equal
    // countDistinct/collect_set — and skip the distinct-aggregate
    // Expand plan, keeping one ObjectHashAggregate pass
    results.toDF()
      .filter(lower(col("confidence")) =!= "no")
      .groupBy(col("compound"))
      .agg(count(col("id")).as("n_docs"),
        array_join(sort_array(collect_list(col("id"))), ";").as("doc_ids"))
  }

  /** J5: dict-first lookup with lowercase fallback then "remote" fetch
    * for residual keys. Dictionary: even-length part types; service
    * resolves the rest deterministically. */
  def j5DictFallback(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val dict = p.select(col("p_type")).distinct()
      .filter(length(col("p_type")) % 2 === 0)
      .select(col("p_type").as("k"), upper(col("p_type")).as("v"))
    val service = new LookupService {
      override def lookupBatch(keys: Seq[String]): Map[String, String] =
        keys.map(k => k -> s"EXT:${k.take(3)}").toMap
    }
    RestLookup.resolve(spark, p.select(col("p_partkey"), col("p_type")), "p_type",
        dict, "k", "v", service)
      .select(col("p_partkey"), col("resolved"))
  }

  /** S6 response parse (finalize_realease.py:658-674 → SURVEY §2.7
    * JSON note): typed `from_json` + field extraction over the events
    * `props` JSON string, then grouped stats — the service-response
    * decode path as a relational operator. Malformed/missing fields
    * become NULL and drop out of count(k), exactly the reference's
    * "skip on parse failure" behavior. */
  def xJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    // redistributed scan: per-row Jackson parse is the expensive part
    // and otherwise runs inside the (single-split) scan task
    Tables.eventsRedistributed(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), "k INT", Map.empty[String, String]).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_parsed"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        round(avg(col("k")), 4).as("avg_k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_classify_aggregate" -> (d1ClassifyAggregate _),
    "j5_dict_fallback"      -> (j5DictFallback _),
    "x_json_extract"        -> (xJsonExtract _),
  )

  val oracle: Map[String, String] = Map(
    "d1_classify_aggregate" ->
      ("WITH fanout AS (SELECT doc_id, unnest(list_sort(list_distinct(" +
       "list_filter(string_split(text, ' '), w -> length(w) >= 6)))[1:3]) AS compound, " +
       "CASE doc_id % 3 WHEN 0 THEN 'YES' WHEN 1 THEN 'probablyYES' ELSE 'NO' END AS confidence " +
       "FROM documents) " +
       "SELECT compound, count(DISTINCT doc_id) AS n_docs, " +
       "list_aggregate(list_sort(list_distinct(list(doc_id))), 'string_agg', ';') AS doc_ids " +
       "FROM fanout WHERE lower(confidence) != 'no' GROUP BY compound"),
    "j5_dict_fallback" ->
      ("SELECT p_partkey, CASE WHEN length(p_type) % 2 = 0 THEN upper(p_type) " +
       "ELSE 'EXT:' || substr(p_type, 1, 3) END AS resolved FROM part"),
    "x_json_extract" ->
      ("SELECT event_type, count(k) AS n_parsed, min(k) AS min_k, max(k) AS max_k, " +
       "round(avg(k), 4) AS avg_k FROM (SELECT event_type, " +
       "CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) GROUP BY event_type"),
  )
}
