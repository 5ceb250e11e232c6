package graft

import graft.queries.TextAnalysisQueries
import org.apache.spark.sql.functions._

class TextAnalysisQueriesSpec extends SparkSpecBase {

  test("every text-analysis query runs non-empty on the smoke SF") {
    TextAnalysisQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("paragraph dedup: survivors partition the segment space; duplicate doc empties") {
    val out = TextAnalysisQueries.taParagraphDedup(spark, sfDir).cache()
    // global invariant: Σ n_kept = number of DISTINCT segments corpus-wide
    val kept = out.agg(sum(col("n_kept"))).collect().head.getLong(0)
    out.unpersist()
    // recompute distinct segments directly from the corpus
    val segs = graft.Tables.documents(spark, sfDir)
      .select(expr("filter(split(text, ' '), w -> length(w) > 0)").as("ws"))
      .select(explode(expr(
        "transform(sequence(0, greatest(cast(ceil(size(ws) / 20.0) as int), 1) - 1), " +
        "i -> array_join(slice(ws, i * 20 + 1, 20), ' '))")).as("seg"))
      .distinct().count()
    assert(kept == segs, s"kept $kept != distinct segments $segs")
    // synthetic pin: doc 1 is a verbatim copy of doc 0 → doc 1 keeps
    // nothing and its reconstruction is the md5 of the empty string
    import spark.implicits._
    val text = (1 to 45).map(i => s"w$i").mkString(" ")
    val dir = graft.ScratchDirs.dir("spec", "paradedup")
    Seq((0L, text), (1L, text), (2L, "only unique words here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pin = TextAnalysisQueries.taParagraphDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(pin(0L)._1 == 3 && pin(0L)._2 == 3, s"original keeps all: $pin")
    assert(pin(1L)._2 == 0, s"verbatim copy keeps nothing: $pin")
    assert(pin(1L)._3 == "d41d8cd98f00b204e9800998ecf8427e", // md5("")
      s"empty reconstruction hash: $pin")
    assert(pin(2L)._2 == 1, s"unique doc survives: $pin")
  }

  test("paragraph dedup: digest-keyed exchanges move strictly fewer bytes than the string-keyed shape") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the r7 shape this round replaced: first-occurrence groupBy and
    // keep-join both keyed on the raw ~20-word segment STRING, so the
    // corpus text crossed every dedup-decision exchange
    def stringKeyed(): DataFrame = {
      val segs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), expr("filter(split(text, ' '), w -> length(w) > 0)").as("ws"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, greatest(cast(ceil(size(ws) / 20.0) as int), 1) - 1), " +
          "i -> array_join(slice(ws, i * 20 + 1, 20), ' '))")).as(Seq("seg_idx", "seg")))
      val first = segs.groupBy(col("seg"))
        .agg(min(struct(col("doc_id"), col("seg_idx"))).as("f"))
      segs.join(first, "seg")
        .withColumn("keep",
          col("doc_id") === col("f.doc_id") && col("seg_idx") === col("f.seg_idx"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"), sum(col("keep").cast("long")).as("n_kept"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("keep"), struct(col("seg_idx"), col("seg"))))),
            s => s.getField("seg")), " ")).as("retained_md5"))
    }
    // AQE off for the measurement: the executed plan is then a plain tree
    // whose ShuffleExchangeExec "dataSize" metrics (uncompressed exchanged
    // row bytes) are directly traversable. Only ENSURE_REQUIREMENTS
    // exchanges count — the fact loader's REPARTITION_BY_NUM
    // redistribution is layout both shapes share, not query cost (same
    // convention as CurationQueriesSpec.queryExchanges).
    def exchangedBytes(df: DataFrame): (Long, Seq[String], String) = {
      import org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS
      val rows = df.collect().map(_.toString).sorted.toSeq
      val per = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.shuffleOrigin == ENSURE_REQUIREMENTS =>
          e.metrics("dataSize").value -> s"${e.outputPartitioning} <- ${e.child.nodeName}"
      }
      (per.map(_._1).sum, rows,
        per.map { case (b, d) => s"  $b B  $d" }.mkString("\n"))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (digestBytes, digestRows, digestDetail) =
        exchangedBytes(TextAnalysisQueries.taParagraphDedup(spark, sfDir))
      val (stringBytes, stringRows, stringDetail) = exchangedBytes(stringKeyed())
      // lockstep first: identical output, then strictly cheaper exchanges
      assert(digestRows == stringRows, "digest-keyed output diverged from the string-keyed shape")
      assert(digestBytes > 0 && digestBytes < stringBytes,
        s"digest-keyed exchanges ($digestBytes B) must move strictly less than " +
        s"the string-keyed shape ($stringBytes B)\ndigest-keyed:\n$digestDetail\n" +
        s"string-keyed:\n$stringDetail")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("paragraph dedup: 128-bit variant is output-identical to the 64-bit form") {
    // the release-grade widening path: unhex(md5) keys must produce
    // byte-identical results (same first-occurrence rule, same
    // reconstruction) — only the exchanged key width differs
    val w64 = TextAnalysisQueries.taParagraphDedup(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val w128 = TextAnalysisQueries.taParagraphDedup128(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(w64 == w128, "128-bit keying diverged from the 64-bit form")
    // and the wide key really is binary(16) on the decision exchanges
    val keyed = TextAnalysisQueries.taParagraphDedup128(spark, sfDir)
    val schemaStr = keyed.queryExecution.analyzed.toString
    assert(schemaStr.contains("unhex"), s"128-bit variant must key on unhex(md5):\n$schemaStr")
  }

  test("contamination: a verbatim leak is flagged at 1.0; ratios stay in [0,1]") {
    val real = TextAnalysisQueries.taContamination(spark, sfDir).cache()
    assert(real.filter(col("contamination") < 0 || col("contamination") > 1).count() == 0)
    assert(real.filter(col("is_contaminated") =!=
      (col("n_contaminated") * 5 >= col("n_grams"))).count() == 0)
    real.unpersist()
    // synthetic pin: eval doc 0 is a verbatim copy of corpus doc 1 →
    // contamination 1.0; eval doc 97 shares nothing → 0.0
    import spark.implicits._
    val leak = "a b c d e f g h i j"
    val clean = "q r s t u v w x y z"
    Seq((0L, leak), (1L, leak), (97L, clean), (2L, "k l m n o p a1 b2 c3 d4"))
      .toDF("doc_id", "text").createOrReplaceTempView("tmp_contam")
    val dir = graft.ScratchDirs.dir("spec", "contam")
    spark.table("tmp_contam").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysisQueries.taContamination(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(0L) == 1.0, s"verbatim leak not flagged: $out")
    assert(out(97L) == 0.0, s"clean doc flagged: $out")
  }

  test("contamination plan broadcasts the eval side — the corpus never shuffle-joins") {
    val plan = TextAnalysisQueries.taContamination(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join planned:\n${plan.take(2000)}")
  }

  test("pack_sequences: offsets are gapless and the big-table window is partitioned") {
    val df = TextAnalysisQueries.taPackSequences(spark, sfDir).cache()
    // gapless stream: sorting by offset, each doc starts where the
    // previous ended — the two-phase cumsum lost nothing
    val rows = df.orderBy(col("stream_offset")).collect()
    var expect = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("stream_offset") == expect,
        s"gap at doc ${r.getLong(0)}: ${r.getAs[Long]("stream_offset")} != $expect")
      expect += r.getAs[Long]("n_tokens")
    }
    // every seq_id holds at most budget tokens of STARTS (bin index is
    // start-offset div 256 by construction)
    df.unpersist()
    // plan shape: the full-table window must be partitioned (parallel);
    // only the tiny bucket-offset window may be global
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "expected the per-bucket (partitioned) cumsum window")
  }

  test("token counts: regex tokens >= whitespace tokens on punctuated text") {
    import spark.implicits._
    val df = Seq(("x", "hello, world! 42 times")).toDF("id", "text")
    df.createOrReplaceTempView("tmp_tc")
    val toks = df.select(
      size(split(col("text"), " ")).as("ws"),
      size(regexp_extract_all(col("text"), lit(TextAnalysisQueries.TokenRegex), lit(0))).as("re"))
      .collect().head
    assert(toks.getInt(0) == 4)
    assert(toks.getInt(1) == 6) // hello , world ! 42 times
  }

  test("quality bands are exhaustive and ratios in [0,1]") {
    val df = TextAnalysisQueries.taQualityScore(spark, sfDir).cache()
    val bad = df.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
      col("punct_ratio") < 0 || col("punct_ratio") > 1).count()
    assert(bad == 0)
    val bands = df.select("quality_band").distinct().collect().map(_.getString(0)).toSet
    assert(bands.subsetOf(Set("high", "medium", "low")))
    df.unpersist()
  }

  test("lang-id prediction is deterministic and covers all docs") {
    val df = TextAnalysisQueries.taLangId(spark, sfDir)
    assert(df.count() == Tables.documents(spark, sfDir).count())
    val preds = df.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "es", "de", "und")))
  }

  test("inverted index: postings capped, ranked, and consistent with df") {
    val rows = TextAnalysisQueries.taInvertedIndex(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (df, posting) = (r.getLong(1), r.getString(3).split(",").toSeq)
      assert(posting.nonEmpty && posting.size <= TextAnalysisQueries.PostingK)
      assert(posting.size == math.min(df, TextAnalysisQueries.PostingK.toLong))
      assert(posting.distinct.size == posting.size, s"dup doc in posting: $r")
      assert(r.getLong(2) >= df, "total_tf >= df")
    }
  }

  test("bm25: top-k plan shape and score sanity") {
    val df = TextAnalysisQueries.taBm25TopK(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"df/stats must broadcast:\n$plan")
    // the query-term IN prune sits below the first aggregate: only
    // matching-term rows reach the (doc_id, tok) shuffle
    assert(plan.contains("tok#") && plan.contains(" IN ") || plan.contains("isin"),
      s"query-term prune missing:\n$plan")
    val rows = df.collect()
    assert(rows.length == TextAnalysisQueries.Bm25TopK)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted.reverse), "rows must come back rank-ordered")
    assert(rows.forall(_.getLong(2) <= TextAnalysisQueries.Bm25Terms.size))
  }

  test("bpe learn: monotone merge frequencies, merged = a+b, lowercase alphabet") {
    val rows = TextAnalysisQueries.bpeLearn(spark, sfDir).orderBy("step").collect()
    assert(rows.length == TextAnalysisQueries.BpeMerges)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1)
      assert(r.getString(3) == r.getString(1) + r.getString(2), s"merged != a+b: $r")
      assert(r.getString(3).matches("[a-z]+"), s"non-alphabet symbol: $r")
      assert(r.getLong(4) > 0)
    }
    // each round picks the global max; merging can only shrink other
    // pair counts and any newly created pair is capped by the merge
    // count, so the chosen frequencies are non-increasing
    val freqs = rows.map(_.getLong(4))
    assert(freqs.zip(freqs.tail).forall { case (x, y) => x >= y }, freqs.mkString(","))
  }

  test("bpe apply: token counts bounded by chars and words, merges compress") {
    val rows = TextAnalysisQueries.bpeApply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, tokens) = (r.getLong(1), r.getLong(2))
      val tpc = r.getDouble(3)
      // every word is >=1 token; no token can be shorter than a char
      assert(tokens >= words, s"tokens < words: $r")
      assert(tpc > 0.0 && tpc <= 1.0, s"tokens_per_char out of (0,1]: $r")
    }
    // the learned merges MUST compress: strictly fewer tokens than
    // chars overall (chars = tokens iff no merge ever applied)
    val totTok = rows.map(_.getLong(2)).sum
    val totChars = rows.map(r => (r.getLong(2) / r.getDouble(3)).round).sum
    assert(totTok < totChars, s"merges never applied: tok=$totTok chars=$totChars")
  }

  test("substring dedup: spans well-formed, planted near-dups heavily masked") {
    val rows = TextAnalysisQueries.taSubstringDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nSpans, dupWords, frac) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nSpans >= 1)
      // each merged island covers at least one full W-gram
      assert(dupWords >= nSpans * TextAnalysisQueries.SubdupW)
      assert(dupWords <= nWords, s"mask exceeds doc: $r")
      assert(frac > 0.0 && frac <= 1.0)
    }
    // docs the exact-Jaccard baseline calls near-dups share >=8-word spans,
    // so both members of every planted pair must be flagged
    val flagged = rows.map(_.getLong(0)).toSet
    val nearDup = graft.queries.DedupQueries.queries("dedup_ngram_jaccard")(spark, sfDir)
      .select("id_a", "id_b").collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(nearDup.subsetOf(flagged),
      s"near-dup docs missing from mask: ${nearDup.diff(flagged)}")
  }

  test("entropy quality: bounds hold, flag splits the corpus, hand-recompute agrees") {
    val rows = TextAnalysisQueries.taEntropyQuality(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_tokens"), r.getAs[Double]("entropy"))
      // 5e-7 slack: the emitted entropy is rounded to 6 dp, so an
      // all-distinct doc (H = log2 n exactly) can exceed the bound by
      // up to half an ulp of the 6th decimal
      assert(h >= -5e-7 && h <= math.log(n.toDouble) / math.log(2) + 5e-7,
        s"entropy out of [0, log2 n]: $r")
    }
    val flagged = rows.count(_.getAs[Boolean]("low_entropy"))
    assert(flagged > 0 && flagged < rows.length,
      s"entropy floor does not split the corpus: $flagged/${rows.length}")
    // hand recompute for one doc
    val doc = Tables.documents(spark, sfDir).filter(col("doc_id") === 0)
      .select("text").collect()(0).getString(0)
    val counts = doc.split(" ").filter(_.nonEmpty).groupBy(identity).map(_._2.length)
    val n = counts.sum.toDouble
    val expect = counts.map(c => -(c / n) * (math.log(c / n) / math.log(2))).sum
    val got = rows.find(_.getLong(0) == 0L).get.getAs[Double]("entropy")
    assert(math.abs(got - expect) < 1e-5, s"doc 0 entropy: $got vs $expect")
  }

  test("winnowing fingerprints: near-dup docs share most fingerprint hashes") {
    val fp = TextAnalysisQueries.winnowFingerprints(spark, sfDir)
      .select("doc_id", "fingerprint").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val nearDups = graft.queries.DedupQueries.dedupNgramJaccard(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val overlaps = nearDups.toSeq.flatMap { case (a, b) =>
      for (fa <- fp.get(a); fb <- fp.get(b))
        yield fa.intersect(fb).size.toDouble / math.max(1, math.min(fa.size, fb.size))
    }
    assert(overlaps.nonEmpty && overlaps.sum / overlaps.size >= 0.5,
      f"mean fingerprint overlap ${overlaps.sum / overlaps.size}%.2f")
  }
}
