package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** Curation pack: value sanity + the plan shapes that make each
  * operator scale (scan-stage projections, single exchanges, broadcast
  * boilerplate set, bounded-heap quota sampling). */
class CurationQueriesSpec extends SparkSpecBase {

  /** Exchanges the QUERY introduces (ENSURE_REQUIREMENTS) — the fact
    * loader's own REPARTITION_BY_NUM redistribution is layout, not
    * query cost, and is excluded. */
  private def queryExchanges(plan: String): Int =
    "Exchange [a-z]+partitioning[^\n]*ENSURE_REQUIREMENTS".r.findAllIn(plan).size

  test("e2e_shard_release: survivors = quality-gated minus non-keeper cluster members") {
    import graft.queries.DedupQueries
    val out = CurationQueries.e2eShardRelease(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupQueries.dedupNgramJaccard(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val keepers = DedupQueries.dedupKeepBest(spark, sfDir).collect()
      .map(_.getLong(2)).toSet
    val survivors = docs.keySet
      .filter(d => docs(d) >= CurationQueries.ReleaseMinChars &&
        !(members(d) && !keepers(d)))
    assert(out.map(_.getLong(1)).sum == survivors.size,
      s"survivor count: ${out.map(_.getLong(1)).sum} != ${survivors.size}")
    assert(out.map(_.getLong(2)).sum == survivors.toSeq.map(docs).sum,
      "per-shard byte accounting must sum to the survivor corpus")
  }

  test("x_global_shuffle: shards partition the corpus, digest pins the permutation") {
    val out = CurationQueries.xGlobalShuffle(spark, sfDir).collect()
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == n, "shards must partition the corpus")
    assert(out.length <= 8 && out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8))
    // rerun reproduces the identical epoch (same digest per shard)
    val again = CurationQueries.xGlobalShuffle(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out.foreach { r =>
      assert(again(r.getLong(0)) == ((r.getLong(1), r.getLong(2), r.getLong(3))),
        s"shuffle not reproducible for shard ${r.getLong(0)}")
    }
    // digest is order-sensitive: permuting two docs inside a shard
    // must change Σ pos·doc_id unless the transposition is degenerate
    val digest = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(digest.values.toSet.size > 1, "degenerate digests")
    // the plan is one hash exchange on shard + per-shard sort (the
    // repartition+sortWithinPartitions shard-writer shape): no global sort
    val plan = CurationQueries.xGlobalShuffle(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"global sort planned:\n${plan.take(1500)}")
  }

  test("x_shard_incremental: delta appends after the base tail, base epoch untouched") {
    val out = CurationQueries.xShardIncremental(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // shard membership is the same key arithmetic as the full epoch:
    // per shard, n_base + n_delta == x_global_shuffle's n_docs
    val full = CurationQueries.xGlobalShuffle(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    full.foreach { case (shard, nDocs) =>
      val r = out(shard)
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_delta") == nDocs,
        s"shard $shard membership drifted from the full epoch")
    }
    // base epoch untouched: base_digest replays a base-only delivery —
    // recompute the even-id permutation directly and compare Σ pos·doc_id
    val d = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(concat(col("doc_id").cast("string"), lit(":shuf42"))).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def digestOf(rows: Seq[(Long, String)], posOffset: Map[Long, Long]): Map[Long, Long] =
      rows.map { case (id, k) => ((math.abs(k(0).toInt) % CurationQueries.NumShards).toLong, id, k) }
        .groupBy(_._1).map { case (shard, g) =>
          val sorted = g.sortBy(t => (t._3, t._2))
          shard -> sorted.zipWithIndex.map { case ((_, id, _), i) =>
            (i + 1 + posOffset.getOrElse(shard, 0L)) * id }.sum
        }
    val baseDigest = digestOf(d.filter(_._1 % 2 == 0).toSeq, Map.empty)
    baseDigest.foreach { case (shard, dig) =>
      assert(out(shard).getAs[Long]("base_digest") == dig,
        s"shard $shard base permutation was perturbed by the delta append")
    }
    // append contiguity: the combined digest = base + delta-with-offset
    val nBase = out.map { case (s, r) => s -> r.getAs[Long]("n_base") }
    val deltaDigest = digestOf(d.filter(_._1 % 2 == 1).toSeq, nBase)
    out.foreach { case (shard, r) =>
      assert(r.getAs[Long]("epoch_digest") ==
        baseDigest.getOrElse(shard, 0L) + deltaDigest.getOrElse(shard, 0L),
        s"shard $shard epoch digest is not base ++ delta")
    }
    // scale shape: the base side crosses once for its counts, which
    // broadcast onto the delta — no shuffle join of base against delta
    val plan = CurationQueries.xShardIncremental(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"base tail counts must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("rangepartitioning"), "no global sort in the delivery path")
  }

  test("x_shard_split: children partition each parent's epoch, split is parent-local") {
    val children = CurationQueries.xShardSplit(spark, sfDir).collect()
    // child -> parent arithmetic: exactly two children per parent id space
    children.foreach { r =>
      assert(r.getAs[Long]("parent_shard") == r.getAs[Long]("child_shard") / 2)
    }
    // cross-query closure: per parent, the children's counts sum to the
    // full epoch's shard count — nothing lost, nothing crossed over
    val byParent = children.groupBy(_.getAs[Long]("parent_shard"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("n_docs")).sum }
    val epoch = CurationQueries.xGlobalShuffle(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byParent == epoch, s"children do not partition parents: $byParent vs $epoch")
    // membership locality recomputed from the raw key arithmetic: every
    // doc's child shard refines its parent shard
    val raw = graft.Tables.documents(spark, sfDir)
      .select(md5(concat(col("doc_id").cast("string"), lit(":shuf42"))).as("k"))
      .select((ascii(substring(col("k"), 1, 1)) % CurationQueries.NumShards).as("parent"),
        ((ascii(substring(col("k"), 1, 1)) % CurationQueries.NumShards) * 2 +
          ascii(substring(col("k"), 2, 1)) % 2).as("child"))
      .collect()
    raw.foreach(r => assert(r.getInt(1) / 2 == r.getInt(0)))
  }

  test("x_shard_merge: merge of split children is the identity on the epoch") {
    // merge ∘ split = identity: merging the child pairs reproduces
    // x_global_shuffle's epoch EXACTLY — same shards, same counts,
    // same Σ pos·doc_id permutation digests
    val merged = CurationQueries.xShardMerge(spark, sfDir).collect()
      .map(r => r.getAs[Long]("parent_shard") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("order_digest")))).toMap
    val epoch = CurationQueries.xGlobalShuffle(spark, sfDir).collect()
      .map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("order_digest")))).toMap
    assert(merged == epoch, s"merge did not invert the split:\n$merged\nvs epoch\n$epoch")
    // provenance closure: per parent, the child-half counts equal the
    // split children's membership counts (both children consumed)
    val children = CurationQueries.xShardSplit(spark, sfDir).collect()
      .map(r => r.getAs[Long]("child_shard") -> r.getAs[Long]("n_docs")).toMap
    CurationQueries.xShardMerge(spark, sfDir).collect().foreach { r =>
      val p = r.getAs[Long]("parent_shard")
      assert(r.getAs[Long]("n_from_even_child") == children.getOrElse(2 * p, 0L),
        s"parent $p even-child count drifted from the split")
      assert(r.getAs[Long]("n_from_odd_child") == children.getOrElse(2 * p + 1, 0L),
        s"parent $p odd-child count drifted from the split")
    }
    // scale shape: ONE hash exchange (the pairwise fan-in), no global sort
    val plan = CurationQueries.xShardMerge(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), "no global sort in the merge path")
    assert(queryExchanges(plan) <= 2, s"merge must stay one fan-in exchange (+agg):\n$plan")
  }

  test("ta_pii_redact is a pure scan-stage projection and masks everything") {
    val df = CurationQueries.taPiiRedact(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(queryExchanges(plan) == 0, s"redaction must not shuffle:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // multiplicity variation is real: all three kinds hit 0/1/2 paths
    val emails = rows.map(_.getLong(1)).toSet
    val phones = rows.map(_.getLong(2)).toSet
    val ips = rows.map(_.getLong(3)).toSet
    assert(emails == Set(0L, 1L), s"emails=$emails")
    assert(phones == Set(1L, 2L), s"phones=$phones")
    assert(ips == Set(0L, 1L), s"ips=$ips")
  }

  test("redacted text retains no raw PII") {
    // rebuild the redacted string (not just counts) and scan it
    val d = Tables.documents(spark, sfDir)
    val red = CurationQueries.taPiiRedact(spark, sfDir)
    // counts of masks must equal counts of originals
    val bad = red.filter(col("n_email") + col("n_phone") + col("n_ip") === 0).count()
    assert(bad == 0, "every doc should carry at least one PII item by construction")
    assert(red.count() == d.count())
  }

  test("ta_url_dedup canonicalizes case/port/fragment/params and shuffles once") {
    val df = CurationQueries.taUrlDedup(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(queryExchanges(plan) == 1, s"expected 1 query exchange:\n$plan")
    val urls = df.select("url_canon").collect().map(_.getString(0))
    assert(urls.forall(_.startsWith("http://")), "scheme not lowercased")
    assert(urls.forall(u => !u.contains(":80")), "default port not stripped")
    assert(urls.forall(u => !u.contains("#")), "fragment not stripped")
    assert(urls.forall(u => !u.contains("utm_")), "tracking params not stripped")
    assert(urls.forall(u => !u.endsWith("/")), "trailing slash not stripped")
    assert(urls.forall(u => u.contains("?id=")), "surviving param lost")
  }

  test("url canonicalizer is idempotent and order-insensitive on params") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
      "https://CDN.site.org/path?b=2&a=1&utm_campaign=y",
      "http://host/",                       // root path
      "ftp://Files.example.net:80/x",       // other scheme, :80 stripped anyway
      "http://host/p?utm_a=1&utm_b=2#f",    // params all dropped
      "http://host/p",                      // no query at all
      "https://h.io/p/?a=1&a=1",            // duplicate param survives sorted
      "HTTPS://UP.example.com/P/Q?Z=9&y=8", // path case preserved, host lowered
    ).toDF("u")
    val once = urls.select(CurationQueries.canonicalizeUrl(col("u")).as("c1"))
    val twice = once.select(col("c1"),
      CurationQueries.canonicalizeUrl(col("c1")).as("c2")).collect()
    twice.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}")
    }
    // param order insensitivity
    val pair = Seq(
      ("http://h/p?b=2&a=1", "http://h/p?a=1&b=2")).toDF("u1", "u2")
      .select(CurationQueries.canonicalizeUrl(col("u1")).as("c1"),
        CurationQueries.canonicalizeUrl(col("u2")).as("c2")).collect()(0)
    assert(pair.getString(0) == pair.getString(1))
  }

  test("ta_boilerplate_grams broadcasts the df-thresholded set") {
    val df = CurationQueries.taBoilerplateGrams(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate set must broadcast back onto the gram stream:\n$plan")
    // fractions live in [0,1] and at least one doc has some boilerplate
    val rows = df.collect()
    assert(rows.forall { r =>
      val f = r.getDouble(3); f >= 0.0 && f <= 1.0 && r.getLong(2) <= r.getLong(1)
    })
    assert(rows.exists(_.getLong(2) > 0), "no boilerplate found at all — threshold broken?")
  }

  test("x_sample_quota uses the bounded-heap operator and matches the window form") {
    val df = CurationQueries.xSampleQuota(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerKey"), s"quota sampling must use the custom op:\n$plan")
    assert(!plan.contains("Sort "), s"bounded heap should replace the sort:\n$plan")
    // parity with the row_number() formulation
    import graft.expr.hashfunctions.poly61
    val d = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("lang"),
      poly61(concat(lit("q"), col("doc_id").cast("string"))).as("h"))
    val w = Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)
    val windowForm = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= CurationQueries.QuotaK)
      .select(col("lang"), col("doc_id"), col("h"))
    assert(df.exceptAll(windowForm).isEmpty && windowForm.exceptAll(df).isEmpty,
      "bounded-heap quota diverges from window form")
    // quota respected per language
    val over = df.groupBy("lang").count()
      .filter(col("count") > CurationQueries.QuotaK).count()
    assert(over == 0)
  }

  test("ann_diverse_sample caps every cluster and covers all clusters") {
    val df = CurationQueries.annDiverseSample(spark, sfDir).cache()
    try {
      val per = df.groupBy("cluster").count().collect()
      assert(per.length == 10, s"expected 10 clusters, got ${per.length}")
      assert(per.forall(_.getLong(1) <= CurationQueries.DiverseCap))
      // assignment must be the literal-argmax PROJECTION (r15): centroids
      // ride as literals inside a `greatest` — no join of any kind and no
      // aggregation undoing a centroid fan-out; the corpus truly never
      // shuffles for assignment
      val plan = CurationQueries.annDiverseSample(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("greatest"), s"literal argmax expected:\n$plan")
      assert(!plan.contains("Join") && !plan.contains("SortAggregate"),
        s"assignment must not join or sort-aggregate:\n$plan")
    } finally df.unpersist()
  }

  test("merge_scd2 intervals tile each user's timeline") {
    val df = CurationQueries.mergeScd2(spark, sfDir).cache()
    try {
      // exactly one open (current) interval per user
      val open = df.filter(col("is_current")).groupBy("user_id").count()
      assert(open.filter(col("count") =!= 1).count() == 0)
      // no zero-length or inverted intervals
      assert(df.filter(col("valid_to") < col("valid_from")).count() == 0)
      // consecutive rows never repeat the same value (SCD2 collapses)
      val w = Window.partitionBy("user_id").orderBy(col("valid_from").asc)
      val rep = df.withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull && col("nxt") === col("event_type")).count()
      assert(rep == 0, "adjacent SCD2 rows with identical value — collapse failed")
    } finally df.unpersist()
  }

  test("x_corpus_mix_weights weights invert the actual shares") {
    val rows = CurationQueries.xCorpusMixWeights(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nDocs, actual, target, weight) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(actual > 0 && target > 0 && nDocs > 0)
      // weight ≈ target/actual (both sides independently rounded)
      assert(math.abs(weight - target / actual) < 1e-4, s"$r")
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9, "target mix must sum to 1")
  }

  test("agg_winsorize clips roughly 2% and narrows the range") {
    val rows = CurationQueries.aggWinsorize(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, nClip) = (r.getLong(1), r.getLong(2))
      val frac = nClip.toDouble / n
      assert(frac > 0.0 && frac < 0.06, s"clip fraction $frac out of band: $r")
      assert(r.getDouble(5) < r.getDouble(6) || n == 1, s"min>=max after clip: $r")
    }
    // winsorized mean is finite and close to raw (1% tails on bounded data)
    assert(rows.forall(r => math.abs(r.getDouble(3) - r.getDouble(4)) < 1.0))
  }

  test("ta_feature_hashing buckets partition the token stream") {
    val df = CurationQueries.taFeatureHashing(spark, sfDir)
    val rows = df.collect()
    assert(rows.forall { r =>
      r.getLong(0) >= 0 && r.getLong(0) < CurationQueries.HashBuckets
    })
    val totalTokens = rows.map(_.getLong(1)).sum
    val direct = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").count()
    assert(totalTokens == direct, s"bucketed tokens $totalTokens != stream $direct")
  }

  test("ta_slice_divergence: KL is nonnegative for every slice") {
    val rows = CurationQueries.taSliceDivergence(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val kl = r.getDouble(2)
      // Gibbs' inequality (≥ -1e-9 for the 6-dp rounding slack)
      assert(kl >= -1e-9 && kl < 10.0, s"KL out of range: $r")
      assert(r.getLong(1) > 0)
    }
    // slices genuinely diverge from the mixture on this corpus
    assert(rows.exists(_.getDouble(2) > 1e-3), "all KL ~ 0 — metric degenerate?")
  }

  test("ta_c4_line_filter: scan-stage, rules fire, hash only for kept pages") {
    val df = CurationQueries.taC4LineFilter(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(queryExchanges(plan) == 0, s"line filter must not shuffle:\n$plan")
    val rows = df.collect()
    rows.foreach { r =>
      val (doc, nl, nk, kept) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(nk <= nl)
      assert(r.isNullAt(4) == !kept, s"clean_hash null iff page dropped: $r")
      if (kept) assert(nk >= CurationQueries.C4MinLines)
      // lorem ipsum / brace injection always sinks the page
      if (doc % 53 == 7 || doc % 47 == 13) assert(!kept, s"noise page survived: $r")
    }
    assert(rows.exists(!_.getBoolean(3)) && rows.exists(_.getBoolean(3)),
      "both page outcomes must be exercised")
  }

  test("lm_bigram_score: every bigram scored, add-one bounds hold") {
    val rows = CurationQueries.lmBigramScore(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      // inner count joins can never drop a bigram (counts cover the corpus)
      assert(r.getLong(1) == docs(r.getLong(0)), s"bigram lost in join: $r")
      val lp = r.getDouble(2)
      assert(lp < 0.0 && lp > -30.0, s"avg log-prob out of range: $r")
    }
  }

  test("sem_dedup: per-cluster accounting closes, duplicates exist") {
    val rows = CurationQueries.semDedup(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val (m, p, d, k) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(k + d == m, s"kept + dropped != members: $r")
      assert(d <= p, s"more drops than pairs: $r")
    }
    assert(rows.map(_.getLong(2)).sum > 0, "threshold finds no duplicates — degenerate")
  }

  test("x_mix_epochs: realized mixture tracks the target within sampling noise") {
    val rows = CurationQueries.xMixEpochs(spark, sfDir).collect()
    val target = CurationQueries.TargetMix.toMap
    rows.foreach { r =>
      val (lang, share) = (r.getString(0), r.getDouble(3))
      // stochastic-rounding noise at n≈60-220 docs/lang: ±0.05 absolute
      assert(math.abs(share - target(lang)) < 0.05, s"share off target: $r")
    }
    assert(rows.map(_.getDouble(3)).sum > 0.999 && rows.map(_.getDouble(3)).sum < 1.001)
  }

  test("agg_robust_zscore: MAD gate flags a plausible outlier fraction") {
    val rows = CurationQueries.aggRobustZscore(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, mad, out) = (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(mad > 0.0, s"degenerate MAD: $r")
      val frac = out.toDouble / n
      assert(frac >= 0.0 && frac < 0.25, s"outlier fraction implausible: $r")
      assert(!r.isNullAt(5), s"inlier mean must exist: $r")
    }
  }

  test("x_split_assign covers all three splits with sane proportions") {
    val rows = CurationQueries.xSplitAssign(spark, sfDir).collect()
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"splits=$bySplit")
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.5, s"train share off: $bySplit")
  }

  test("ta_dsir_weights separates the target slice and broadcasts the ratio table") {
    val df = CurationQueries.taDsirWeights(spark, sfDir)
    // the scoring join's build side is the 512-bucket log-ratio table —
    // must be a broadcast, never a corpus-wide shuffle
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "bucket ratio table should broadcast-join onto the token stream")
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    // selected is defined off the ROUNDED score (oracle parity)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getDouble(2) > 0), s"selected flag inconsistent: $r")
    }
    // the importance weights must actually rank target-language docs
    // above the rest on average — the method's entire point
    val lang = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, rest) = rows.partition(r => lang(r.getLong(0)) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_.getDouble(2)).sum / en.length
    val restMean = rest.map(_.getDouble(2)).sum / rest.length
    assert(enMean > restMean,
      f"target slice should outscore the rest: en=$enMean%.4f rest=$restMean%.4f")
  }

  test("corpus datacard: covers every slice, shares sum to one") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.xCorpusDatacard(spark, sfDir).collect()
    val slices = Tables.documents(spark, sfDir)
      .select("lang", "source").distinct().count()
    assert(rows.length == slices)
    assert(math.abs(rows.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-4)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sfDir).count())
  }

  test("k-anonymity: roll-up constants agree with the class rows, flags match k") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.xKAnonymity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val k = CurationQueries.KAnonK
    val nViol = rows.count(!_.getAs[Boolean]("anonymous"))
    val atRisk = rows.filter(!_.getAs[Boolean]("anonymous")).map(_.getAs[Long]("n_users")).sum
    rows.foreach { r =>
      assert(r.getAs[Boolean]("anonymous") == (r.getAs[Long]("n_users") >= k))
      assert(r.getAs[Long]("n_classes") == rows.length)
      assert(r.getAs[Long]("n_violating") == nViol)
      assert(r.getAs[Long]("users_at_risk") == atRisk)
    }
  }

  test("time split: partitions cover all events, straddle count matches a brute recompute") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.xTimeSplit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("train", "test"))
    val ev = Tables.events(spark, sfDir)
    val total = ev.count()
    assert(rows.values.map(_.getAs[Long]("n_events")).sum == total)
    // brute recompute of the cross-split user overlap
    val cutoff = to_timestamp(lit(CurationQueries.TimeSplitCutoff))
    val trainU = ev.filter(col("ts") < cutoff).select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val testU = ev.filter(col("ts") >= cutoff).select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val shared = trainU.intersect(testU).size.toLong
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_shared_users") == shared, s"straddle count wrong: $r vs $shared")
    }
    assert(rows("train").getAs[Long]("n_users") == trainU.size)
    assert(rows("test").getAs[Long]("n_users") == testU.size)
  }

  test("quantile select keeps at least the top 30% per language, all above threshold") {
    val rows = CurationQueries.xQuantileSelect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_scored"); val k = r.getAs[Long]("n_kept")
      assert(k >= 0.3 * n - 1, s"kept too few of the distribution: $r")
      assert(k <= n)
      assert(r.getAs[Double]("min_kept_q") >= r.getAs[Double]("thr"),
        s"a kept doc scores below the threshold: $r")
    }
  }
}
