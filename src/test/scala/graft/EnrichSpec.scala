package graft

import graft.enrich._
import graft.queries.EnrichQueries
import org.apache.spark.sql.functions._

class EnrichSpec extends SparkSpecBase {

  test("every enrich query runs non-empty on the smoke SF") {
    EnrichQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("classifier fans out at most 3 results per input, batches respected") {
    EnrichSpec.batchSizes.clear()
    val probe = new Classifier {
      val inner = new DeterministicClassifier
      override def classifyBatch(items: Seq[ClassifyInput]): Seq[ClassifyResult] = {
        EnrichSpec.batchSizes.add(items.size); inner.classifyBatch(items)
      }
    }
    val out = ClassifyOp(spark, Tables.documents(spark, sfDir), "doc_id", "text",
      probe, batchSize = 10)
    val perId = out.groupBy("id").count().agg(max("count")).collect().head.getLong(0)
    assert(perId <= 3)
    // closures run in local-mode executor threads of this JVM — the
    // static queue observes the real batch sizes
    assert(!EnrichSpec.batchSizes.isEmpty)
    EnrichSpec.batchSizes.forEach(s => assert(s <= 10, s"batch of $s exceeds limit"))
  }

  test("retrying classifier retries with backoff then succeeds") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val flaky = new Classifier {
      override def classifyBatch(items: Seq[ClassifyInput]): Seq[ClassifyResult] = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        Seq(ClassifyResult(1, "ok", "YES"))
      }
    }
    val r = new RetryingClassifier(flaky, attempts = 3, baseBackoffMs = 10000,
      capMs = 120000, sleep = delays += _)
    assert(r.classifyBatch(Seq(ClassifyInput(1, "x"))).head.compound == "ok")
    assert(delays.toSeq == Seq(10000L, 20000L))
  }

  test("rest lookup: dict hits never reach the service; residuals are batched distinct") {
    import spark.implicits._
    EnrichSpec.fetchedKeys.clear()
    val svc = new LookupService {
      override def lookupBatch(keys: Seq[String]): Map[String, String] = {
        keys.foreach(EnrichSpec.fetchedKeys.add); keys.map(k => k -> s"R:$k").toMap
      }
    }
    val facts = Seq("Alpha", "alpha", "Beta", "Gamma", "Gamma").toDF("name")
    val dict = Seq(("Alpha", "A1")).toDF("k", "v")
    val out = RestLookup.resolve(spark, facts, "name", dict, "k", "v", svc)
      .select("name", "resolved").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("Alpha") == "A1")
    assert(out("alpha") == "A1") // lowercase fallback join
    assert(out("Beta") == "R:Beta")
    val fetched = EnrichSpec.fetchedKeys.toArray.map(_.toString).toSeq
    assert(fetched.sorted == Seq("Beta", "Gamma"), s"service saw $fetched")
  }
}

/** JVM-static probes: serialized closures get copies of locals, but in
  * local mode executors share this JVM, so statics observe the calls. */
object EnrichSpec {
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  val fetchedKeys = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
