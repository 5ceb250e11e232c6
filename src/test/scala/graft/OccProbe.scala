package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: band/chunk bucket occupancy of the LSH fences at a given
  * SF dir — the numbers behind the fence scaladoc and the gate-SF pins.
  * Run: sbt "Test/runMain graft.OccProbe /root/testdata/sf0.1" */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("occ-probe").getOrCreate()
    import graft.queries.DedupQueries
    val banded = DedupQueries.bandedDocs(DedupQueries.shingleTable(spark, dir))
    println("top band buckets:")
    banded.groupBy("band_val").count().orderBy(desc("count")).show(8)
    val s = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.expr.hashfunctions.simhash64(split(col("text"), " ")).as("sh"))
    val chunks = s.select(posexplode(array((0 until 8).map(i =>
      shiftrightunsigned(col("sh"), i * 8).bitwiseAND(lit(0xFFL))): _*))
      .as(Seq("chunk_idx", "chunk_val")))
    println("top chunk buckets:")
    chunks.groupBy("chunk_idx", "chunk_val").count().orderBy(desc("count")).show(8)
    spark.stop()
  }
}
