package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Sources & sinks pack (SURVEY §2.1): the reference's scan/sink
  * surface exercised as oracle-checkable roundtrips — gzipped TSV
  * (S1/K1), XML record parsing with the 3-way date coalesce (S2),
  * line-list text artifacts (S4/K3), and key-level resume (S7).
  *
  * Roundtrips write to a per-SF temp dir then read back through the
  * real source path, so the serializer AND the parser sit in the
  * oracle-compared path. At 100 TB the TSV path is exactly S1's
  * caveat: gzip text is unsplittable — one task per file — so the
  * engine re-encodes to parquet at the ingestion edge (this pack is
  * that edge).
  */
object SourceQueries {

  private def tmp(dir: String, name: String): String =
    s"/tmp/graft_sources/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/$name"

  /** S1+K1: TSV-with-header write (gzip) → schema'd TSV scan. */
  def s1TsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp(dir, "lineitem_tsv")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"), col("l_quantity"))
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "true").option("compression", "gzip")
      .csv(out)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_returnflag", StringType), StructField("l_quantity", DoubleType)))
    spark.read.option("sep", "\t").option("header", "true").schema(schema).csv(out)
  }

  /** S2: XML article records → parsed extraction with the reference's
    * 3-way date coalesce (process_pubmed.sh:50-54: first non-null of
    * three XPath alternatives). XML is BUILT from `orders` rows, parsed
    * back with `from_xml`; the oracle computes the same fields
    * relationally — so the XML serializer+parser round-trip is what is
    * being checked. */
  def s2XmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val year = substring(col("o_orderdate").cast("string"), 1, 4)
    // one of three date slots populated, by key — like PubMed's
    // ArticleDate | JournalIssue PubDate | MedlineDate alternatives
    val xml = concat(
      lit("<article><id>"), col("o_orderkey"), lit("</id>"),
      when(col("o_orderkey") % 3 === 0, concat(lit("<adate>"), year, lit("</adate>")))
        .when(col("o_orderkey") % 3 === 1, concat(lit("<jdate>"), year, lit("</jdate>")))
        .otherwise(concat(lit("<mdate>"), year, lit("</mdate>"))),
      lit("<prio>"), col("o_orderpriority"), lit("</prio></article>"))
    val schema = "struct<id:long,adate:string,jdate:string,mdate:string,prio:string>"
    o.select(from_xml(xml, lit(schema)).as("a"))
      .select(col("a.id").as("order_id"),
        coalesce(col("a.adate"), col("a.jdate"), col("a.mdate")).cast("int").as("pub_year"),
        col("a.prio").as("priority"))
  }

  /** S4+K3: sorted-unique line-list text sink → line scan (the
    * mesh-tag artifact shape: one value per line). */
  def s4LineListRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmp(dir, "types_txt")
    Tables.part(spark, dir)
      .select(concat(lit("TYPE:"), col("p_type")).as("value"))
      .distinct().orderBy(col("value"))
      .coalesce(1).write.mode("overwrite").text(out)
    spark.read.text(out)
      .select(regexp_replace(col("value"), "^TYPE:", "").as("p_type"))
  }

  /** S7/T2: key-level resume — anti-join the input against the
    * already-done key set, then summarize remaining work. */
  def s7ResumeAnti(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val done = o.filter(col("o_orderkey") % 7 === 0).select(col("o_orderkey"))
    o.join(done, Seq("o_orderkey"), "left_anti")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_remaining"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_tsv_roundtrip"       -> (s1TsvRoundtrip _),
    "s2_xml_extract"         -> (s2XmlExtract _),
    "s4_line_list_roundtrip" -> (s4LineListRoundtrip _),
    "s7_resume_anti"         -> (s7ResumeAnti _),
  )

  val oracle: Map[String, String] = Map(
    "s1_tsv_roundtrip" ->
      "SELECT l_orderkey, l_partkey, l_returnflag, l_quantity FROM lineitem",
    "s2_xml_extract" ->
      ("SELECT o_orderkey AS order_id, CAST(substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS INT) " +
       "AS pub_year, o_orderpriority AS priority FROM orders"),
    "s4_line_list_roundtrip" ->
      "SELECT DISTINCT p_type FROM part",
    "s7_resume_anti" ->
      ("SELECT o_orderstatus, count(*) AS n_remaining FROM orders " +
       "WHERE o_orderkey % 7 != 0 GROUP BY o_orderstatus"),
  )
}
