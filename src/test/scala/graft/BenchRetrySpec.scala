package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the storm-retry decision (VERDICT r12 #1) and its inputs: the
  * /proc samplers and the committed-steady-artifact loader. The
  * decision logic is pure so these pins hold independent of host
  * noise; the samplers are smoke-checked against the real /proc this
  * suite runs on (Linux CI/bench hosts — they degrade to None/0 off
  * Linux and the decision then falls back to absolute thresholds). */
class BenchRetrySpec extends AnyFunSuite {

  test("quiet fast samples never retry") {
    assert(!BenchRetry.shouldRetry(0.5, Some(0.4), stormFrac = 0.02))
    // within the <1.3x quiet-host band of a slow-but-steady query
    assert(!BenchRetry.shouldRetry(4.0, Some(3.7), stormFrac = 0.02))
    // no steady value (new query): 2 s floor protects sub-second noise
    assert(!BenchRetry.shouldRetry(1.9, None, stormFrac = 0.02))
  }

  test("implausibly slow samples retry even without storm evidence") {
    // d2's driver sample: 40.94 s vs steady 1.14 — the r12 case
    assert(BenchRetry.shouldRetry(40.94, Some(1.14), stormFrac = 0.0))
    assert(BenchRetry.shouldRetry(2.1, Some(0.3), stormFrac = 0.0))
    // 3x steady dominates the 2 s floor for heavy queries
    assert(!BenchRetry.shouldRetry(9.0, Some(3.7), stormFrac = 0.0))
    assert(BenchRetry.shouldRetry(11.2, Some(3.7), stormFrac = 0.0))
  }

  test("storm evidence lowers the bar to 1.5x steady (1 s floor)") {
    assert(BenchRetry.shouldRetry(1.9, Some(1.0), stormFrac = 0.35))
    assert(!BenchRetry.shouldRetry(1.4, Some(1.0), stormFrac = 0.35))
    // a fast sample under a storm is still a fine sample
    assert(!BenchRetry.shouldRetry(0.4, Some(0.4), stormFrac = 0.60))
    // sub-threshold storm falls back to the 3x rule
    assert(!BenchRetry.shouldRetry(1.9, Some(1.0), stormFrac = 0.15))
  }

  test("HostStat reads /proc on this host and fractions are sane") {
    val c0 = HostStat.cpu()
    assume(c0.isDefined, "/proc/stat unavailable — non-Linux host")
    // burn a little CPU so the interval is non-empty
    var x = 0L; var i = 0
    while (i < 20000000) { x += i; i += 1 }
    val c1 = HostStat.cpu()
    assert(x != 0)
    val f = HostStat.stormFrac(c0, c1)
    assert(f >= 0.0 && f <= 1.0, s"storm fraction out of range: $f")
    val faults = HostStat.faults()
    assert(faults.minor >= 0 && faults.major >= 0)
    // unreadable/absent samples degrade to 0.0, never throw
    assert(HostStat.stormFrac(None, c1) == 0.0)
    assert(HostStat.stormFrac(c1, c0) == 0.0) // reversed interval
  }

  test("SteadyRef loads the committed r12 artifact from the repo root") {
    val loaded = SteadyRef.load()
    assert(loaded.isDefined, "no BENCH_steady_rN.json found in cwd")
    val ref = loaded.get
    assert(ref.file.matches("BENCH_steady_r\\d+\\.json"))
    assert(ref.sf.endsWith("sf0.1"), s"steady artifact sf: ${ref.sf}")
    assert(ref.secs.size >= 242, s"steady ref has only ${ref.secs.size} queries")
    // the r12 adjudication anchors
    assert(ref.secs.get("d2_smiles_canonical").exists(s => s > 0 && s < 3.0))
    assert(ref.secs.values.forall(_ > 0))
    // newest round wins (both r9 and r12+ artifacts are committed)
    assert(ref.file.replaceAll("\\D+", "").toInt >= 12)
  }
}
