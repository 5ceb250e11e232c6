package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Results go through the `noop` sink, not count():
  * count() lets Catalyst prune every projection (a text-cleaning chain
  * "benchmarked" via count() never runs the cleaning expressions), while
  * noop fully evaluates and serializes each output row, measuring the
  * real operator cost.
  */
object Bench {
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), qIdx) =>
      System.err.println(s"[bench-start] $name ${System.currentTimeMillis()}")
      val times = (1 to repeat).map { _ =>
        val (r0, w0) = ShuffleTelemetry.snapshot(spark)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case t: Throwable =>
          errors += 1
          System.err.println(s"[bench-error] $name: ${t.getClass.getName}: ${t.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val (r1, w1) = ShuffleTelemetry.snapshot(spark)
        shuffleBytes(name) = (r1 - r0, w1 - w0) // last repeat wins, like the time
        // drop per-query persisted frames (Verify does the same): cached
        // blocks accumulating across 182 queries age the session and skew
        // the later queries' times
        spark.catalog.clearCache()
        // RDD-level blocks (localCheckpoint) survive catalog.clearCache —
        // drop them explicitly
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      // shuffle files on the RAM-backed scratch dir are only reclaimed
      // when the ContextCleaner sees their references die in a DRIVER
      // GC — across a 182-query session that backlog is the measured
      // 2-7x late-query inflation. A periodic explicit GC keeps the
      // scratch tmpfs (and the executor block manager) near-empty.
      if (qIdx % 8 == 7) System.gc()
      if (repeat > 1)
        System.err.println(f"[bench] $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
      name -> times.last
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
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec","errors":$errors,"queries":$qs,"sf":"$sfDir"}"""
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
        s""""$k":{"sec":${r3(v)},"shuffle_read":$r,"shuffle_write":$w}"""
      }.mkString("{", ",", "}")
      val full = s"""{"metric":"total","value":${r3(total)},"unit":"sec","errors":$errors,"sf":"$sfDir","queries_all":$detail}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
