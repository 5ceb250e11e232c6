package graft

/** Shuffle-BYTE drift guard (VERDICT r10 #5): the plan-shape lints
  * (PlanLintSpec) catch a new exchange or a lost broadcast, but a 3×
  * byte regression behind an UNCHANGED plan shape — a wider shuffle
  * key, a dropped early projection, a fatter agg buffer — sailed
  * through every prior gate. This spec pins sf0.001 shuffle read/write
  * bytes for a representative, SessionMemo-free query set and fails on
  * a >2× move in either direction.
  *
  * The pins were measured with graft.ShuffleProbe under this exact
  * session config (local[4], 4 shuffle partitions, AQE on) and are
  * byte-for-byte reproducible: shuffle totals at a fixed SF are a pure
  * function of data + plan (lz4 is deterministic; AQE coalescing moves
  * partition boundaries, not totals). Each query measures COLD (cache
  * cleared first), so suite order cannot shift them. If a deliberate
  * plan change moves a pin, re-run the probe and re-pin IN THE SAME
  * COMMIT, saying why. */
class ShuffleDriftSpec extends SparkSpecBase {

  // (query, pinned shuffle-read bytes, pinned shuffle-write bytes)
  private val pins: Seq[(String, Long, Long)] = Seq(
    ("q1_pricing_summary", 1646L, 1086L), // partial-agg'd: bytes ~ groups, not rows
    ("j1_dim_join_distinct", 7223L, 7223L), // broadcast join: only the distinct shuffles
    ("w1_topk_sort", 2897L, 2897L), // TakeOrdered: per-partition heads only
    ("ta_token_count", 87696L, 87696L), // scan-side kernel + small agg
    ("dedup_exact", 125947L, 125947L), // digest-keyed groupBy, one exchange
    ("dedup_exact_substring", 737123L, 737123L), // compact 8-byte gram keys, no text
    ("dedup_minhash_lsh", 149632L, 149632L), // band keys + verify joins
    ("dedup_simhash", 134888L, 134888L))  // pigeonhole join with fused hamming (re-pinned r11)

  test("shuffle bytes stay within 2x of their pinned sf0.001 baselines") {
    pins.foreach { case (name, pinR, pinW) =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val fn = SparkEntry.queries(name)
      val (_, r, w) = ShuffleTelemetry.measure(spark) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      def inBand(actual: Long, pin: Long, kind: String): Unit =
        assert(actual >= pin / 2 && actual <= pin * 2,
          s"$name $kind shuffle bytes drifted >2x: $actual vs pinned $pin — " +
          "if the plan change is deliberate, re-pin via graft.ShuffleProbe " +
          "and explain in the commit")
      inBand(r, pinR, "read")
      inBand(w, pinW, "write")
      info(s"$name read=$r write=$w (pins $pinR/$pinW)")
    }
  }
}
