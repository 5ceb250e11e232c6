package graft

import java.util.concurrent.atomic.AtomicInteger

/** Pins [[SessionMemo]]'s concurrency contract: one build per key no
  * matter how many concurrent consumers, no lock held across the build
  * job, and a failed build retracted so the next caller recomputes
  * instead of reading a half-written artifact. */
class SessionMemoSpec extends SparkSpecBase {

  test("concurrent consumers trigger exactly one build and share the artifact") {
    val builds = new AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val futures = (1 to 8).map { _ =>
      Future {
        SessionMemo.parquet(spark, "memo_spec_shared", "dirA") {
          builds.incrementAndGet()
          spark.range(10).toDF()
        }.count()
      }
    }
    val counts = Await.result(Future.sequence(futures), 2.minutes)
    assert(counts.forall(_ == 10L), s"consumers read divergent artifacts: $counts")
    assert(builds.get() == 1, s"build ran ${builds.get()} times for one key")
  }

  test("distinct keys and distinct dirs build independently") {
    val a = SessionMemo.parquet(spark, "memo_spec_k1", "dirA")(spark.range(3).toDF())
    val b = SessionMemo.parquet(spark, "memo_spec_k1", "dirB")(spark.range(5).toDF())
    val c = SessionMemo.parquet(spark, "memo_spec_k2", "dirA")(spark.range(7).toDF())
    assert((a.count(), b.count(), c.count()) == ((3L, 5L, 7L)))
  }

  test("a failed build is retracted so the next caller retries") {
    val attempts = new AtomicInteger(0)
    intercept[RuntimeException] {
      SessionMemo.parquet(spark, "memo_spec_fail", "dirA") {
        attempts.incrementAndGet()
        throw new RuntimeException("boom")
      }
    }
    // second call must NOT observe the failed entry — it rebuilds
    val ok = SessionMemo.parquet(spark, "memo_spec_fail", "dirA") {
      attempts.incrementAndGet()
      spark.range(4).toDF()
    }
    assert(ok.count() == 4L)
    assert(attempts.get() == 2, "failed build was not retracted")
  }
}
