package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch pack (north-star "novel sketch" operators): the approximate
  * aggregates a 100 TB training-data pipeline leans on when exact
  * distinct/quantile state would not fit — HyperLogLog++ cardinality
  * (`approx_count_distinct`) and a quantile sketch
  * (`percentile_approx`), both Catalyst-native partial aggregates whose
  * sketch state merges map-side, so the shuffle carries one bounded
  * sketch per (group × partition) instead of the value sets.
  *
  * Sketch internals differ across engines by design, so these are
  * rows-only for the driver; SketchQueriesSpec pins them against the
  * exact answers with the published error bounds (HLL++ rsd, quantile
  * rank accuracy) — the meaningful correctness statement for an
  * approximate operator.
  */
object SketchQueries {

  val Rsd = 0.02          // HLL++ target relative standard deviation
  // rank accuracy 1/2000: plenty for p50/p95 while keeping the sketch
  // update cost low — accuracy 10000 measured ~4x slower end-to-end for
  // no observable gain at these quantiles
  val QuantileAcc = 2000

  /** Rank margin for the quantile bound check: the sketch guarantees
    * rank error ≤ 1/QuantileAcc (0.0005); the check allows 10x that. */
  val QuantileMargin = 0.005

  /** Per event-type: approx distinct users + p50/p95 value sketch,
    * VERIFIED against the exact answers in-query. Sketch internals are
    * engine-specific, so raw sketch outputs can never hash-match a
    * DuckDB oracle — instead the query emits the exact distinct count
    * plus BOOLEAN error-bound assertions (HLL++ within 3·rsd; sketch
    * quantiles inside the exact p±margin envelope), and the oracle
    * expects TRUE — the meaningful correctness statement for an
    * approximate operator, enforced by the driver's hash compare.
    *
    * The sketches and the exact answers are aggregated SEPARATELY and
    * joined on the (tiny) group key: mixing a distinct aggregate with
    * the imperative sketch aggregates would force an Expand +
    * sort-based plan (measured ~4x slower); each branch stays a
    * mergeable one-pass ObjectHashAggregate. */
  def sketchCardinalityQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sk = ev.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), Rsd).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)), lit(QuantileAcc))
          .as("ps"))
      .select(col("event_type"), col("approx_users"),
        element_at(col("ps"), 1).as("p50s"), element_at(col("ps"), 2).as("p95s"))
    // the quantile check is RANK-based — the sketch's actual guarantee
    // (a returned element's rank is within ±ε·n of the target rank,
    // here with 10x margin): count values <=/< the sketch's answer and
    // bound those counts. Valid for any group size, unlike comparing
    // against interpolated exact percentiles (which sit strictly above
    // the low data value in tiny groups).
    def rankOk(p: Double, le: Column, lt: Column, n: Column): Column =
      (le >= floor(lit(p - QuantileMargin) * n)) &&
        (lt <= ceil(lit(p + QuantileMargin) * n))
    ev.join(broadcast(sk), "event_type")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"),
        first(col("approx_users")).as("approx_users"),
        sum(when(col("value") <= col("p50s"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("p50s"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("p95s"), 1L).otherwise(0L)).as("le95"),
        sum(when(col("value") < col("p95s"), 1L).otherwise(0L)).as("lt95"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * (3 * Rsd)).as("approx_users_ok"),
        rankOk(0.5, col("le50"), col("lt50"), col("n")).as("p50_ok"),
        rankOk(0.95, col("le95"), col("lt95"), col("n")).as("p95_ok"))
  }

  /** Count–min-sketch heavy hitters (net-new): frequency estimation
    * with O(w·d) state regardless of input size — THE streaming
    * frequent-items sketch when exact per-key counts would be a
    * full-size shuffle. Built with Spark's native `count_min_sketch`
    * partial aggregate (sketches merge map-side; one ~w·d array per
    * partition crosses the wire), then each group key is probed against
    * the merged sketch. CMS guarantees est ≥ true and, with probability
    * ≥ confidence, est ≤ true + ε·N — emitted as a boolean contract the
    * oracle expects TRUE (fixed seed ⇒ deterministic). The one-row
    * sketch collect is the probe side, not data movement; the exact
    * counts stay a distributed aggregate. */
  def sketchHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val Eps = 0.0001; val Conf = 0.99; val Seed = 42
    val ev = Tables.events(spark, dir)
    val skBytes = ev.agg(
        expr(s"count_min_sketch(event_type, ${Eps}d, ${Conf}d, $Seed)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("exact_n"))
    val keys = exact.select(col("event_type")).collect().map(_.getString(0)).toSeq
    import spark.implicits._
    val est = keys.map(k => (k, cms.estimateCount(k))).toDF("event_type", "est_n")
    exact.join(broadcast(est), "event_type")
      .withColumn("n_total", sum(col("exact_n")).over())
      .select(col("event_type"), col("exact_n"),
        (col("est_n") >= col("exact_n") &&
          col("est_n") <= col("exact_n") + ceil(col("n_total") * Eps)).as("cms_ok"))
  }

  /** KMV signature size: σ(Jaccard) ≈ sqrt(J(1-J)/k) ≤ 0.0625 at
    * k=64; the contract margin is ~5σ. */
  val KmvK = 64
  val KmvMargin = 0.3

  /** KMV (k-minimum-values) set-similarity sketch: per event_type, the
    * [[KmvK]] smallest md5 hashes of its distinct user set; pairwise
    * Jaccard between types is then estimated from signatures alone
    * (|{x ∈ k-min of A∪B : x ∈ A ∩ B}| / |k-min of A∪B| — Beyer et
    * al. 2007, "On synopses for distinct-value estimation under
    * multiset operations", SIGMOD). Unlike HLL (union-only) this
    * sketch supports INTERSECTION estimates, and unlike seeded
    * sketches it is a PURE FUNCTION of the data (md5 order), so the
    * DuckDB oracle replays the estimate itself bit-exactly — plus the
    * exact Jaccard and a ±[[KmvMargin]] contract boolean.
    *
    * Scale shape: the signature build runs on the bounded-heap
    * [[graft.plans.TopKPerKey]] operator — O(types·k) state, no
    * per-group sort — over the distinct (type, user-hash) stream; the
    * estimator then works on tiny k-row signatures (no re-touch of the
    * fact table), which is the point: set overlaps between 100 TB
    * partitions get estimated from kilobyte synopses. The exact
    * Jaccard here is the verification baseline (distinct-pair
    * self-join), harness-scale only. */
  def sketchKmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .distinct()
    val sig = graft.plans.TopKPerKeyOp(du, Seq(col("event_type")), Seq(col("h").asc), KmvK)
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(col("h"))).as("sig"))
    val cnt = du.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = du.as("a").join(du.as("b"),
        col("a.h") === col("b.h") && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("ni"))
    val sa = col("sa"); val sb = col("sb")
    val merged = slice(array_sort(array_union(sa, sb)), 1, KmvK)
    val estExpr = size(filter(merged, x => array_contains(sa, x) && array_contains(sb, x)))
      .cast("double") / size(merged)
    val pairs = sig.as("s1").join(sig.as("s2"),
        col("s1.event_type") < col("s2.event_type"))
      .select(col("s1.event_type").as("type_a"), col("s2.event_type").as("type_b"),
        col("s1.sig").as("sa"), col("s2.sig").as("sb"))
    pairs
      .join(inter, Seq("type_a", "type_b"), "left")
      .join(broadcast(cnt.select(col("event_type").as("type_a"), col("n").as("na"))), "type_a")
      .join(broadcast(cnt.select(col("event_type").as("type_b"), col("n").as("nb"))), "type_b")
      .withColumn("est", estExpr)
      .withColumn("exact",
        coalesce(col("ni"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("ni"), lit(0L))))
      .select(col("type_a"), col("type_b"),
        round(col("est"), 6).as("est_jaccard"),
        round(col("exact"), 6).as("exact_jaccard"),
        (abs(col("est") - col("exact")) <= KmvMargin).as("kmv_ok"))
  }

  /** MG counter budget: the corpus has 30 tokens above the n/(m+1)
    * threshold at m=64 across all SFs — comfortably under m. */
  val MgM = 64

  /** Misra–Gries heavy tokens: a [[MgM]]-counter mergeable
    * frequent-items summary over the corpus token stream
    * ([[graft.expr.MisraGries]]), verified against exact counts. The
    * emitted rows are the GUARANTEED-heavy tokens (exact frequency
    * > n/(m+1), a deterministic set) with two contract booleans the
    * oracle expects TRUE: the token is tracked by the sketch
    * (membership guarantee) and its estimate is inside
    * [true − n/(m+1), true]. Estimates themselves are merge-order-
    * dependent and deliberately NOT emitted.
    *
    * Scale shape: unlike the CMS query (driver-probed sketch), the MG
    * summary is a plain algebraic aggregate — partials combine
    * map-side, one O(m) summary per partition crosses the wire, and
    * the result needs no second pass over the keys. The exact-count
    * side here is the verification baseline. */
  def sketchMgHeavyTokens(spark: SparkSession, dir: String): DataFrame = {
    import graft.expr.mgfunctions.misra_gries
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val mg = toks.agg(misra_gries(col("w"), MgM).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term").as("w"), col("e.est").as("est"))
    val stats = toks.agg(count(lit(1)).as("n_tokens"))
    val bound = col("n_tokens").cast("double") / (MgM + 1)
    toks.groupBy(col("w")).agg(count(lit(1)).as("exact_n"))
      .crossJoin(broadcast(stats))
      .filter(col("exact_n") > bound)
      .join(broadcast(mg), Seq("w"), "left")
      .select(col("w").as("token"), col("exact_n"),
        col("est").isNotNull.as("in_sketch"),
        (col("est").isNotNull && col("est") <= col("exact_n") &&
          (col("exact_n") - col("est")).cast("double") <= bound).as("mg_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cardinality_quantiles" -> (sketchCardinalityQuantiles _),
    "sketch_heavy_hitters"         -> (sketchHeavyHitters _),
    "sketch_kmv_jaccard"           -> (sketchKmvJaccard _),
    "sketch_mg_heavy_tokens"       -> (sketchMgHeavyTokens _),
  )

  /** The oracle checks the exact count and expects every bound
    * assertion to hold — a sketch drifting past its published error
    * envelope fails the driver's hash compare. */
  val oracle: Map[String, String] = Map(
    "sketch_cardinality_quantiles" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
       "TRUE AS approx_users_ok, TRUE AS p50_ok, TRUE AS p95_ok " +
       "FROM events GROUP BY event_type"),
    "sketch_heavy_hitters" ->
      ("SELECT event_type, count(*) AS exact_n, TRUE AS cms_ok " +
       "FROM events GROUP BY event_type"),
    // full replay: the KMV estimate is a pure function of the data
    // (k smallest md5 hex strings — lexicographic = numeric order),
    // so DuckDB recomputes the ESTIMATE, not just the contract
    "sketch_kmv_jaccard" ->
      ("WITH du AS (SELECT DISTINCT event_type, md5(user_id::VARCHAR) AS h FROM events), " +
       "r AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM du), " +
       s"sig AS (SELECT event_type, list(h ORDER BY h) AS sig FROM r WHERE rn <= $KmvK GROUP BY event_type), " +
       "cnt AS (SELECT event_type, count(*) AS n FROM du GROUP BY event_type), " +
       "inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS ni " +
       "FROM du a JOIN du b ON a.h = b.h AND a.event_type < b.event_type GROUP BY 1, 2), " +
       "pairs AS (SELECT s1.event_type AS type_a, s2.event_type AS type_b, " +
       s"list_sort(list_distinct(s1.sig || s2.sig))[1:$KmvK] AS merged, " +
       "s1.sig AS sa, s2.sig AS sb FROM sig s1 JOIN sig s2 ON s1.event_type < s2.event_type), " +
       "est AS (SELECT type_a, type_b, " +
       "len(list_filter(merged, x -> list_contains(sa, x) AND list_contains(sb, x)))::DOUBLE " +
       "/ len(merged) AS est, sa, sb FROM pairs) " +
       "SELECT p.type_a, p.type_b, round(p.est, 6) AS est_jaccard, " +
       "round(coalesce(i.ni, 0)::DOUBLE / (ca.n + cb.n - coalesce(i.ni, 0)), 6) AS exact_jaccard, " +
       "TRUE AS kmv_ok " +
       "FROM est p LEFT JOIN inter i ON p.type_a = i.type_a AND p.type_b = i.type_b " +
       "JOIN cnt ca ON ca.event_type = p.type_a JOIN cnt cb ON cb.event_type = p.type_b"),
    // the guaranteed-heavy set is exact-count-determined; the sketch
    // claims are the booleans (MG membership + error bound)
    "sketch_mg_heavy_tokens" ->
      ("WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), " +
       "tt AS (SELECT w FROM t WHERE w <> ''), " +
       "n AS (SELECT count(*) AS n_tokens FROM tt), " +
       "c AS (SELECT w, count(*) AS exact_n FROM tt GROUP BY w) " +
       "SELECT w AS token, exact_n, TRUE AS in_sketch, TRUE AS mg_ok " +
       s"FROM c, n WHERE exact_n > n_tokens::DOUBLE / ${MgM + 1}"),
  )
}
