package graft.ops

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Provenance & validation operators (SURVEY §2.8 P1/P3):
  * release-info capture next to every sink and CHECK-style row
  * constraints, engine-side.
  */
object Provenance {

  /** P1 (finalize_realease.py:64-97): write parquet + a
    * `_provenance.json` sidecar — row count (captured via `observe`,
    * no second scan), schema, content sha256, step name, parameters,
    * input files. */
  def writeWithProvenance(df: DataFrame, path: String, step: String,
                          parameters: Map[String, String] = Map.empty): Unit = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(path)
    val rows = obs.get("rows")
    val digest = sha256OfDir(path)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val params = parameters.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val inputs = df.inputFiles.sorted.map(q).mkString("[", ",", "]")
    val json =
      s"""{"file": ${q(path)}, "rows": $rows, "sha256": ${q(digest)},
         |"written_at": ${q(java.time.Instant.now().toString)},
         |"step": ${q(step)}, "parameters": $params,
         |"schema": ${q(df.schema.catalogString)}, "sources": $inputs}""".stripMargin
    Files.writeString(Paths.get(path, "_provenance.json"), json)
  }

  /** Content digest of a written dataset dir: sha256 over the data
    * files' bytes in name order (X18 at artifact level). */
  def sha256OfDir(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val files = Files.list(Paths.get(path)).iterator()
    val data = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    while (files.hasNext) {
      val f = files.next()
      val n = f.getFileName.toString
      if (!n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc")) data += f
    }
    data.sortBy(_.getFileName.toString).foreach(f => md.update(Files.readAllBytes(f)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** P3 (etl/schema/validate.py): named CHECK constraints → violation
    * counts in ONE pass (conditional-sum aggregation, no per-rule
    * scans), unpivoted to (rule, n_violations) rows. */
  def constraintViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val agg = df.agg(
      sum(when(!rules.head._2, 1L).otherwise(0L)).as(rules.head._1),
      rules.tail.map { case (n, c) => sum(when(!c, 1L).otherwise(0L)).as(n) }: _*)
    val stacked = rules.map { case (n, _) =>
      struct(lit(n).as("rule"), col(n).as("n_violations"))
    }
    agg.select(explode(array(stacked: _*)).as("r")).select(col("r.rule"), col("r.n_violations"))
  }

  /** Hard gate: throw if any rule is violated (validate.py's non-zero
    * exit). */
  def assertConstraints(df: DataFrame, rules: Seq[(String, Column)]): Unit = {
    val bad = constraintViolations(df, rules)
      .filter(col("n_violations") > 0).collect()
    if (bad.nonEmpty) throw new IllegalStateException(
      "constraint violations: " + bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
  }
}
