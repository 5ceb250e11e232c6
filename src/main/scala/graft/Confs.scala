package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override: set, run, restore (or unset if the
  * key was never set). Used wherever a query tunes a setting for one
  * bounded phase — loop shuffle width sized to edge volume, stateful
  * drains' state-store count, the RocksDB provider for
  * transformWithState — so the session the driver shares across every
  * registered query always comes back as it was. */
object Confs {
  def withSessionConf[T](spark: SparkSession, key: String, value: String)(body: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** The most common override: shuffle width sized to a phase's actual
    * data volume (e.g. a graph loop shuffling only near-dup edges). */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    withSessionConf(spark, "spark.sql.shuffle.partitions", n.toString)(body)
}
