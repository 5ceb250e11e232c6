package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-lookup boundary (SURVEY §2.1 S6 + §2.3 J5 — the SMILES
  * resolution chain, finalize_realease.py:645-699): local dictionary
  * first (broadcast join on exact key, then on the lowercased key),
  * and only the residual unresolved keys go to the remote service —
  * distinct keys, batched per partition, never a per-row call.
  *
  * Scale: both dict joins broadcast (dimension side); the fallback
  * fetch runs over DISTINCT unresolved keys only, so remote traffic is
  * proportional to dictionary misses, not input size, and the fetched
  * mini-dimension broadcasts back. The reference's bug of building its
  * lowercase dict as a list of pairs then calling `.get()`
  * (finalize_realease.py:512,688) is what the second broadcast join
  * does correctly here.
  */
trait LookupService extends Serializable {
  /** Resolve a batch of keys → key→value (missing keys absent). */
  def lookupBatch(keys: Seq[String]): Map[String, String]
}

object RestLookup {

  /** facts LEFT-join dict on key, then on lower(key), coalesce; rows
    * still unresolved fetch through `service`. Adds column `resolved`
    * (null only when the service itself misses). */
  def resolve(spark: SparkSession, facts: DataFrame, keyCol: String,
              dict: DataFrame, dictKey: String, dictVal: String,
              service: LookupService, batchSize: Int = 20): DataFrame = {
    import spark.implicits._
    val exact = broadcast(dict.select(col(dictKey).as("__k"), col(dictVal).as("__v1")))
    val lowered = broadcast(dict.groupBy(lower(col(dictKey)).as("__kl"))
      .agg(min(col(dictVal)).as("__v2")))
    val joined = facts
      .join(exact, col(keyCol) === col("__k"), "left")
      .join(lowered, lower(col(keyCol)) === col("__kl"), "left")
      .withColumn("__dictv", coalesce(col("__v1"), col("__v2")))
      .drop("__k", "__v1", "__kl", "__v2")
    val fetched = joined.filter(col("__dictv").isNull)
      .select(col(keyCol).cast("string")).distinct().as[String]
      .mapPartitions(_.grouped(batchSize).flatMap(b => service.lookupBatch(b).toSeq))
      .toDF("__fk", "__fv")
    joined.join(broadcast(fetched), col(keyCol) === col("__fk"), "left")
      .withColumn("resolved", coalesce(col("__dictv"), col("__fv")))
      .drop("__dictv", "__fk", "__fv")
  }
}
