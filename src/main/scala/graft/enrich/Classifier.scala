package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

case class ClassifyInput(id: Long, text: String)
/** UDTF-shaped output: one input → 0..3 result rows (D1 pairs with the
  * X12 name-split explode, run_gpt_filter.py:167-182). */
case class ClassifyResult(id: Long, compound: String, confidence: String)

/** External-classifier boundary (SURVEY §2.10 D1 — the LLM batch
  * classifier, run_gpt_filter.py:100-188): batched, retried,
  * partition-local. The engine never embeds the network client in a
  * per-row UDF — batches of `batchSize` go through one call, mirroring
  * the reference's 10-abstracts-per-request protocol, and retry with
  * capped backoff mirrors its 10→120 s ×2 loop (sleep is injectable so
  * tests don't wait).
  */
trait Classifier extends Serializable {
  def classifyBatch(items: Seq[ClassifyInput]): Seq[ClassifyResult]
}

/** Deterministic stand-in for the LLM (no egress in this engine): up
  * to 3 distinct long words per doc become "compounds"; confidence
  * cycles on id. Chosen to be SQL-expressible so the WHOLE operator —
  * batching, flatMap fan-out, name guards — sits in the oracle path. */
class DeterministicClassifier extends Classifier {
  override def classifyBatch(items: Seq[ClassifyInput]): Seq[ClassifyResult] =
    items.flatMap { in =>
      val names = in.text.split(" ").filter(_.length >= 6).distinct.sorted.take(3)
      val conf = (in.id % 3) match {
        case 0 => "YES"
        case 1 => "probablyYES"
        case _ => "NO"
      }
      names.map(n => ClassifyResult(in.id, n, conf))
    }
}

/** Retry wrapper: `attempts` tries with exponential backoff starting at
  * `baseBackoffMs`, doubling, capped — the reference's protocol with
  * the sleep injectable. */
class RetryingClassifier(inner: Classifier, attempts: Int = 3,
                         baseBackoffMs: Long = 10000, capMs: Long = 120000,
                         sleep: Long => Unit = Thread.sleep) extends Classifier {
  override def classifyBatch(items: Seq[ClassifyInput]): Seq[ClassifyResult] = {
    var delay = baseBackoffMs
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return inner.classifyBatch(items)
      catch { case e: Throwable =>
        last = e
        if (i < attempts - 1) { sleep(delay); delay = math.min(delay * 2, capMs) }
      }
      i += 1
    }
    throw last
  }
}

object ClassifyOp {
  /** Run `classifier` over (id, text) rows in partition-local batches.
    * One external call per batch; output fans out 0..3 rows per input.
    * Scale: pure narrow op — no shuffle; batch size bounds request
    * payload, partition count bounds concurrency (= executor slots). */
  def apply(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
            classifier: Classifier, batchSize: Int = 10): Dataset[ClassifyResult] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[ClassifyInput]
      .mapPartitions(_.grouped(batchSize).flatMap(classifier.classifyBatch))
  }
}
