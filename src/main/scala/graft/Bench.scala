package graft
import org.apache.spark.sql.SparkSession

/** Storm-retry decision (VERDICT r12 #1), kept pure so BenchRetrySpec
  * can pin it. The bench host is a co-tenant VM whose contention
  * windows (sys+steal storms, measured via /proc/stat at up to 90% of
  * a 5 s sample) inflate RANDOM single-run samples 10-100× over the
  * committed min-of-repeats steady value while the plans — byte-pinned
  * by ShuffleDriftSpec — are unchanged. A single-pass bench therefore
  * needs an in-run defense: re-run (once, time-budgeted) any query
  * whose sample is implausible against its committed steady value or
  * demonstrably overlapped a storm, and keep the min. The min is the
  * right estimator because the noise is strictly additive. */
object BenchRetry {
  /** sys+steal fraction above which a window counts as storm-hit. */
  val StormFrac = 0.20
  /** No-storm-evidence path: retry only a sample this many × steady —
    * far outside the measured quiet-host run-to-run band (<1.3×). */
  val SlowFactor = 3.0
  /** With storm evidence the bar drops: the window is KNOWN dirty. */
  val StormSlowFactor = 1.5
  /** Expectation for queries with no committed steady value (new this
    * round): the r12 steady fleet mean, 0.76 s/q. */
  val DefaultSteady = 0.76

  def shouldRetry(sec: Double, steady: Option[Double], stormFrac: Double): Boolean = {
    val s = steady.getOrElse(DefaultSteady)
    sec > math.max(2.0, SlowFactor * s) ||
      (stormFrac > StormFrac && sec > math.max(1.0, StormSlowFactor * s))
  }
}

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Results go through the `noop` sink, not count():
  * count() lets Catalyst prune every projection (a text-cleaning chain
  * "benchmarked" via count() never runs the cleaning expressions), while
  * noop fully evaluates and serializes each output row, measuring the
  * real operator cost.
  */
object Bench {

  /** One timed sample plus the host-state evidence recorded around it:
    * the sys+steal fraction of the window, the process fault deltas
    * (the mmap_lock page-fault storms show up as minflt bursts), and
    * our own process's cpu/wall ratio for the window — low ratio on a
    * slow sample = we were descheduled (co-tenant USER-cpu contention
    * that sys+steal cannot see); high ratio = a genuine compute/GC/JIT
    * cost inside the JVM. */
  final case class Sample(sec: Double, storm: Double,
      minflt: Long, majflt: Long, cpuRatio: Double, errored: Boolean)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same pin as Verify: the events ts normalization (NTZ-layout
      // parquet → session-TZ timestamp) must be an identity on the
      // stored micros, and window alignment must match the oracle's
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 84 queries × several codegen'd stages each overflow the default
      // 100-entry generated-class cache; eviction then causes Janino
      // recompile storms mid-bench (jstack: threads blocked in
      // GeneratedClass.generate) that land on arbitrary queries
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // shuffle/spill scratch on the RAM-backed tmpfs: the bench host's
      // /tmp is a virtio disk whose write stalls dominated run-to-run
      // variance (see ScratchDirs)
      .config("spark.local.dir", ScratchDirs.dir("spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-reader paths once so the first timed
    // query doesn't absorb session startup: exercise the GENERIC
    // operator shapes (scan, shuffle agg, broadcast join, window, sort)
    // on the 25-row `nation` table — compiles the shared generated-code
    // infrastructure without touching fact data or the measured queries.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.range(1000).select(sum(col("id")))
        .write.format("noop").mode("overwrite").save()
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.write.format("noop").mode("overwrite").save()
      n.groupBy(col("n_regionkey")).agg(count(lit(1)), collect_list(col("n_name")))
        .write.format("noop").mode("overwrite").save()
      n.join(broadcast(n.select(col("n_regionkey").as("rk")).distinct()),
          col("n_regionkey") === col("rk"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
        .orderBy(col("rn")).limit(5)
        .write.format("noop").mode("overwrite").save()
      // force CollationAwareUTF8String.<clinit>: Spark 4 builds its ICU
      // case-mapping tables lazily on the first NON-ASCII case op,
      // a 20-30 s one-time cost that otherwise lands on whichever
      // measured query's data first trips it (jstack: one RUNNABLE
      // thread in com.ibm.icu CaseMapImpl.toTitle for the whole stall,
      // under CollationAwareUTF8String.<clinit>)
      spark.range(1).select(
          lower(lit("Étude")), upper(lit("ß")), initcap(lit("élan")))
        .write.format("noop").mode("overwrite").save()
    }
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the run to named
    // queries; SPARK_GRAFT_REPEAT=n times each query n times and keeps
    // the last measurement (isolates first-run codegen compile cost)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = math.max(1,
      sys.env.get("SPARK_GRAFT_REPEAT").flatMap(_.toIntOption).getOrElse(1))
    // a query that throws is LOGGED and COUNTED — the stdout JSON carries
    // "errors":N so a broken round can't masquerade as a fast one (a
    // swallowed crash times at near-zero and the total still parses)
    var errors = 0
    // per-query shuffle read/write bytes (VERDICT r10 #5): catches the
    // byte regressions the plan-shape lints can't see
    val shuffleBytes = scala.collection.mutable.Map[String, (Long, Long)]()
    // storm-retry state (VERDICT r12 #1): the committed steady artifact
    // is the per-query expectation; thresholds only apply when this run
    // is at the artifact's SF. Retries are time-budgeted so a genuinely
    // regressed fleet can't double the run: half the steady total,
    // clamped to [60, 300] s. Retry applies to the driver's single-pass
    // mode only — SPARK_GRAFT_REPEAT runs want raw samples (the repeat
    // tooling takes its own min), as does SPARK_GRAFT_NO_RETRY=1.
    val steadyRef = SteadyRef.load()
    val steadySfOk = steadyRef.exists(_.sf == sfDir)
    def steadyFor(name: String): Option[Double] =
      if (steadySfOk) steadyRef.flatMap(_.secs.get(name)) else None
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val steadySum = selected.flatMap(q => steadyFor(q._1)).sum
    val retryEnabled = repeat == 1 && !sys.env.contains("SPARK_GRAFT_NO_RETRY")
    val retryBudget0 =
      if (steadySum > 0) math.min(300.0, math.max(60.0, 0.5 * steadySum)) else 120.0
    var retryBudget = retryBudget0
    var retries = 0
    val hostDetail = scala.collection.mutable.Map[String, Vector[Sample]]()
    val results = selected.zipWithIndex.map { case ((name, fn), qIdx) =>
      System.err.println(s"[bench-start] $name ${System.currentTimeMillis()}")
      def sampleOnce(): Sample = {
        val c0 = HostStat.cpu(); val f0 = HostStat.faults()
        val p0 = HostStat.procCpuSec()
        val (r0, w0) = ShuffleTelemetry.snapshot(spark)
        val t0 = System.nanoTime()
        var errored = false
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case t: Throwable =>
          errors += 1; errored = true
          System.err.println(s"[bench-error] $name: ${t.getClass.getName}: ${t.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val c1 = HostStat.cpu(); val f1 = HostStat.faults()
        val p1 = HostStat.procCpuSec()
        val (r1, w1) = ShuffleTelemetry.snapshot(spark)
        shuffleBytes(name) = (r1 - r0, w1 - w0) // last sample wins (bytes are plan-deterministic)
        // drop per-query persisted frames (Verify does the same): cached
        // blocks accumulating across 182 queries age the session and skew
        // the later queries' times
        spark.catalog.clearCache()
        // RDD-level blocks (localCheckpoint) survive catalog.clearCache —
        // drop them explicitly
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        Sample(dt, HostStat.stormFrac(c0, c1),
          f1.minor - f0.minor, f1.major - f0.major,
          if (dt > 0) (p1 - p0) / dt else 0.0, errored)
      }
      var samples = (1 to repeat).toVector.map(_ => sampleOnce())
      val first = samples.last
      if (retryEnabled && !first.errored && retryBudget > 0 &&
          BenchRetry.shouldRetry(first.sec, steadyFor(name), first.storm)) {
        System.err.println(f"[bench-retry] $name first=${first.sec}%.2f " +
          f"storm=${first.storm}%.3f steady=${steadyFor(name).getOrElse(-1.0)}%.2f " +
          f"budget=$retryBudget%.1f")
        val again = sampleOnce() // may overdraw the budget once; bounded by the slowest query
        retries += 1
        retryBudget -= again.sec
        samples :+= again
      }
      // single-pass mode keeps the MIN across first+retry (additive
      // noise); repeat mode keeps the LAST, unchanged since r2 (isolates
      // first-run codegen cost; the repeat tooling mins over stderr)
      val kept = if (repeat > 1) samples.last.sec else samples.map(_.sec).min
      // shuffle files on the RAM-backed scratch dir are only reclaimed
      // when the ContextCleaner sees their references die in a DRIVER
      // GC — across a 182-query session that backlog is the measured
      // 2-7x late-query inflation. A periodic explicit GC keeps the
      // scratch tmpfs (and the executor block manager) near-empty.
      if (qIdx % 8 == 7) System.gc()
      if (samples.size > 1)
        System.err.println(f"[bench] $name: ${samples.map(s => f"${s.sec}%.2f").mkString(" ")}")
      // per-sample host evidence: sec@sysStealFrac/minflt/majflt/cpuRatio
      // — committed via the BENCH_OUT artifact and parsed by
      // dev/bench_repeats.py, so every slow sample carries its own
      // storm-or-not adjudication (VERDICT r12 #2)
      System.err.println(s"[bench-host] $name: " +
        samples.map(s =>
            f"${s.sec}%.3f@${s.storm}%.3f/${s.minflt}/${s.majflt}/${s.cpuRatio}%.2f")
          .mkString(" "))
      hostDetail(name) = samples
      name -> kept
    }
    // The driver captures only a ~3 KB TAIL of stdout and parses the
    // metric line out of it (r01 recorded parsed:null because the full
    // 111-query map, printed twice, overflowed that window and the line
    // got clipped mid-JSON). Keep the line SMALL: full per-query detail
    // goes to stderr, the stdout JSON carries the total plus a fixed
    // headline subset, rounded to 3 dp.
    val headline = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
      "f1_project_filter", "j1_dim_join_distinct", "j2_semi_join",
      "x1_clean_chain", "s1_tsv_roundtrip", "e2e_finalize",
      "d1_classify_aggregate", "dedup_exact", "dedup_ngram_jaccard",
      "dedup_minhash_lsh", "dedup_simhash", "ann_brute_topk", "ann_ivf_topk",
      "ta_token_count", "ta_quality_score", "win_moving_avg",
      "win_sessionize", "t1_stream_tumbling",
      // round-3 flagships (stdout line stays well under the ~3 KB tail
      // window: ~120 B added, ~860 B per copy total)
      "t7_stream_lsh_dedup", "ta_contamination", "ann_quantized_topk",
      // curation-pack flagships (~80 B more; ~940 B per copy)
      "graph_pagerank", "ta_boilerplate_grams", "x_sample_quota",
      // round-3 session-2 flagships (~150 B more; ~1.1 KB per copy —
      // still < half the ~3 KB tail window for both copies together)
      "sem_dedup", "ta_bm25_topk", "lm_bigram_score", "fuzzy_join_jw",
      "q9_product_type_profit", "dedup_canonical",
      // round-5 additions (~70 B; both copies still fit the tail window)
      "t11_transform_with_state", "k2_excel_roundtrip", "d2_smiles_canonical",
      // round-6 flagship (~30 B)
      "t14_checkpoint_recovery",
      // round-9 flagships (~70 B; both stdout copies still fit the
      // ~3 KB tail window)
      "d11_aromatic_canonical", "dedup_exact_substring")
    // explicit root locale: the default f"" interpolator is
    // locale-sensitive, and a comma-decimal locale would make the
    // machine-parsed metric line invalid JSON
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val byName = results.toMap
    System.err.println(results.map { case (k, v) => s""""$k":${r3(v)}""" }
      .mkString("[bench-detail] {", ",", "}"))
    System.err.println(results.map { case (k, _) =>
        val (r, w) = shuffleBytes.getOrElse(k, (0L, 0L))
        s""""$k":[$r,$w]"""
      }.mkString("[bench-shuffle] {", ",", "}"))
    val qs = headline.flatMap(k => byName.get(k).map(v => s""""$k":${r3(v)}"""))
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // self-describing protocol (VERDICT r12 #1): the metric line says
    // HOW it was measured — which steady artifact gated retries, the
    // thresholds, and how much of the retry budget was spent — so the
    // number adjudicates itself without prose. Kept compact: both
    // stdout copies must fit the driver's ~3 KB tail window.
    val protocol =
      if (!retryEnabled) s"raw samples (repeat=$repeat, no storm-retry)"
      else {
        val ref = steadyRef.filter(_ => steadySfOk).map(_.file).getOrElse("none")
        f"storm-retry(min of 2): rerun if t>max(2s,${BenchRetry.SlowFactor}%.0fx steady) " +
          f"or sys+steal>${BenchRetry.StormFrac}%.2f and t>${BenchRetry.StormSlowFactor}%.1fx; " +
          f"steady=$ref; budget ${retryBudget0}%.0fs used ${retryBudget0 - retryBudget}%.1fs"
      }
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec","errors":$errors,"retries":$retries,"protocol":"$protocol","queries":$qs,"sf":"$sfDir"}"""
    // emit twice: a prefixed copy for parsers that strip an sbt-style
    // "[info] " tag, then the bare JSON as the LAST stdout line for
    // parsers that json.loads the final line directly (build.sbt sets
    // showSuccess := false so no "[success]" line follows; both copies
    // fit the ~3 KB tail window at ~800 B each)
    println(s"[info] $json")
    println(json)
    // SPARK_GRAFT_BENCH_OUT=path additionally writes the FULL artifact —
    // the headline metric line plus the complete per-query map with
    // seconds and shuffle read/write bytes — used to commit the
    // steady-state artifact (BENCH_steady_rN.json, SPARK_GRAFT_REPEAT=3
    // last-run values) alongside the driver's single-run BENCH_rN.json,
    // so first-run codegen/memo tails AND byte regressions are
    // adjudicable from committed artifacts, not stderr archaeology
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      val detail = results.map { case (k, v) =>
        val (r, w) = shuffleBytes.getOrElse(k, (0L, 0L))
        val ss = hostDetail.getOrElse(k, Vector.empty)
        // full per-sample evidence: seconds, the window's sys+steal
        // fraction, and (minflt, majflt) deltas — the committed record
        // that makes slow samples mechanically adjudicable
        val samplesJ = ss.map(s => r3(s.sec)).mkString("[", ",", "]")
        val stormJ = ss.map(s => r3(s.storm)).mkString("[", ",", "]")
        val faultsJ = ss.map(s => s"[${s.minflt},${s.majflt}]").mkString("[", ",", "]")
        val cpuJ = ss.map(s => String.format(java.util.Locale.ROOT, "%.2f", s.cpuRatio))
          .mkString("[", ",", "]")
        s""""$k":{"sec":${r3(v)},"shuffle_read":$r,"shuffle_write":$w,"samples":$samplesJ,"sys_steal":$stormJ,"faults":$faultsJ,"cpu_ratio":$cpuJ}"""
      }.mkString("{", ",", "}")
      val full = s"""{"metric":"total","value":${r3(total)},"unit":"sec","errors":$errors,"retries":$retries,"protocol":"$protocol","sf":"$sfDir","queries_all":$detail}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
