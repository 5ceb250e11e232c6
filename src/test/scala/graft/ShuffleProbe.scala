package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: per-query shuffle read/write bytes under the TEST session
  * config (local[4], 4 shuffle partitions, AQE on) — the numbers behind
  * ShuffleDriftSpec's pins. Run:
  *   sbt 'Test/runMain graft.ShuffleProbe q1_pricing_summary,dedup_exact' */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    val spark = SparkSpecBase.session
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // twice: first run pays one-off materialization, second is steady
      (1 to 2).foreach { i =>
        val (_, r, w) = ShuffleTelemetry.measure(spark) {
          fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        }
        println(s"[shuffle-probe] $n run$i read=$r write=$w")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
