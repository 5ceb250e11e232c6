package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for named queries to files —
  * the r14 optimization round's plan evidence
  * (`plans/r14/<query>_{before,after}.txt`). Builds each query's plan
  * without executing the final action (constructors may still run
  * their eager prep). Usage:
  *
  *   SPARK_GRAFT_ONLY=q1,q2 dev/run_main.sh graft.PlanDump <outDir> <suffix>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Confs.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.local.dir", ScratchDirs.dir("spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          System.err.println(s"[plandump] $name ok")
        } catch { case t: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
        } finally {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
      }
    spark.stop()
  }
}
