package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the storm-retry decision (VERDICT r12 #1; two-phase economics
  * per VERDICT r13 #1) and its inputs: the /proc samplers and the
  * committed-steady-artifact loader. The decision logic is pure so
  * these pins hold independent of host noise; the samplers are
  * smoke-checked against the real /proc this suite runs on (Linux
  * CI/bench hosts — they degrade to None/0 off Linux and the decision
  * then falls back to absolute thresholds). */
class BenchRetrySpec extends AnyFunSuite {

  test("quiet fast samples are never suspects") {
    assert(!BenchRetry.isSuspect(0.5, 0.4, stormFrac = 0.02))
    // within the <1.3x quiet-host band of a slow-but-steady query
    assert(!BenchRetry.isSuspect(4.0, 3.7, stormFrac = 0.02))
  }

  test("implausibly slow samples are suspects even without storm evidence") {
    // d2's r12 driver sample: 40.94 s vs steady 1.14
    assert(BenchRetry.isSuspect(40.94, 1.14, stormFrac = 0.0))
    assert(BenchRetry.isSuspect(2.1, 0.3, stormFrac = 0.0))
    // 3x steady dominates the 2 s floor for heavy queries
    assert(!BenchRetry.isSuspect(9.0, 3.7, stormFrac = 0.0))
    assert(BenchRetry.isSuspect(11.2, 3.7, stormFrac = 0.0))
  }

  test("storm evidence lowers the bar to 1.5x steady (1 s floor)") {
    assert(BenchRetry.isSuspect(1.9, 1.0, stormFrac = 0.35))
    assert(!BenchRetry.isSuspect(1.4, 1.0, stormFrac = 0.35))
    // a fast sample under a storm is still a fine sample
    assert(!BenchRetry.isSuspect(0.4, 0.4, stormFrac = 0.60))
    // sub-threshold storm falls back to the 3x rule
    assert(!BenchRetry.isSuspect(1.9, 1.0, stormFrac = 0.15))
  }

  test("budget scales with measured excess, clamped to [60, 300]") {
    assert(BenchRetry.budget(0.0) == 60.0)      // quiet pass earns the floor
    assert(BenchRetry.budget(45.0) == 60.0)
    assert(BenchRetry.budget(130.0) == 130.0)   // stormy pass earns its excess
    assert(BenchRetry.budget(1e6) == 300.0)     // a regressed fleet can't double the run
  }

  test("steady-less queries get their family median, not a fleet-wide flat") {
    val steadies = Map(
      "t14_checkpoint_recovery" -> 3.31, "t16_stream_containment" -> 3.55,
      "t22_postings_retention" -> 3.71, "t7_stream_lsh_dedup" -> 2.1,
      "x1_clean_chain" -> 0.3, "x18_sha256" -> 0.2, "a1_distinct" -> 0.4)
    // a NEW streaming query with a 3 s state-store floor must not be
    // compared to the 0.76 s fleet mean (r13 "what's wrong" #3): the
    // t-family median (3.43) keeps it out of the suspect set
    val t = BenchRetry.familySteady("t23_new_stream_thing", steadies).get
    assert(t == BenchRetry.median(Seq(3.31, 3.55, 3.71, 2.1)))
    assert(!BenchRetry.isSuspect(3.0, t, stormFrac = 0.02))
    // a family with no committed members falls back to the fleet median
    val z = BenchRetry.familySteady("zz_brand_new", steadies).get
    assert(z == BenchRetry.median(steadies.values.toSeq))
    // empty artifact → None (and Bench disables retry entirely)
    assert(BenchRetry.familySteady("anything", Map.empty).isEmpty)
  }

  test("kept seconds: min over non-errored samples when any exist") {
    import Bench.Sample
    def s(sec: Double, errored: Boolean) = Sample(sec, 0.0, 0, 0, 1.0, errored)
    // a retry that throws quickly must not replace a valid measurement
    assert(Bench.keptSec(Vector(s(4.2, false), s(0.1, true))) == 4.2)
    assert(Bench.keptSec(Vector(s(4.2, false), s(1.3, false))) == 1.3)
    // every sample errored → raw min (the errors counter flags it)
    assert(Bench.keptSec(Vector(s(0.7, true), s(0.3, true))) == 0.3)
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

  test("SteadyRef loads the newest committed artifact from the repo root") {
    val loaded = SteadyRef.load()
    assert(loaded.isDefined, "no BENCH_steady_rN.json found in cwd")
    val ref = loaded.get
    assert(ref.file.matches("BENCH_steady_r\\d+\\.json"))
    assert(ref.sf.endsWith("sf0.1"), s"steady artifact sf: ${ref.sf}")
    assert(ref.secs.size >= 242, s"steady ref has only ${ref.secs.size} queries")
    // the r12 adjudication anchors
    assert(ref.secs.get("d2_smiles_canonical").exists(s => s > 0 && s < 3.0))
    assert(ref.secs.values.forall(_ > 0))
    // newest round wins (r9 and r12+ artifacts are all committed)
    assert(ref.file.replaceAll("\\D+", "").toInt >= 12)
  }
}
