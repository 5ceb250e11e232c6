package graft

import org.apache.spark.sql.Row

/** Cross-partitioning determinism net: the oracle's hash compare
  * requires every emitted value to be BIT-IDENTICAL run to run, and
  * the one mechanism that can silently break that for floating-point
  * pipelines is partial-aggregation merge order, which varies with the
  * shuffle partitioning. Each FP-sensitive query family's
  * representative runs under two radically different shuffle widths
  * and must produce the exact same rows — the regression net for the
  * determinism pins (9-dp model quantization, ordered folds,
  * 6-dp-rounded ranking keys) the queries rely on.
  */
class DeterminismSpec extends SparkSpecBase {

  private def rowsAt(parts: Int)(q: (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame): Seq[Row] =
    graft.Confs.withShufflePartitions(spark, parts) {
      val df = q(spark, sfDir)
      df.collect().toSeq.sortBy(_.toString)
    }

  private def pinned(name: String,
                     q: (org.apache.spark.sql.SparkSession, String) =>
                       org.apache.spark.sql.DataFrame): Unit =
    test(s"$name is bit-identical across shuffle partitionings (3 vs 17)") {
      val a = rowsAt(3)(q)
      val b = rowsAt(17)(q)
      assert(a == b, s"$name diverges across partitionings: " +
        a.zip(b).collectFirst { case (x, y) if x != y => s"$x vs $y" }.getOrElse("size diff"))
    }

  // iterative FP loop with ordered-fold reduction
  pinned("graph_pagerank", queries.DedupQueries.graphPagerank)
  // 9-dp-pinned k-means centroids feeding cosine/argmax
  pinned("sim_centroid_confusion", queries.SimilarityQueries.simCentroidConfusion)
  // ordered-fold entropy + threshold flag
  pinned("ta_entropy_quality", queries.TextAnalysisQueries.taEntropyQuality)
  // 6-dp-rounded ranking keys under a window
  pinned("ta_bm25_topk", queries.TextAnalysisQueries.taBm25TopK)
  // double-valued jaccard threshold on the PPJoin verify
  pinned("dedup_ngram_jaccard", queries.DedupQueries.dedupNgramJaccard)
  // RRF fusion of two rounded rank lists
  pinned("hybrid_rrf_topk", queries.SimilarityQueries.hybridRrfTopk)
  // bounded-heap topk_pairs tails (r6): partial buffers merge in
  // partition arrival order — the strict (score, id) total order must
  // make the surviving k pairs independent of that order
  pinned("ann_ivf_topk", queries.SimilarityQueries.annIvfTopk)
  // PQ: codebook Lloyd folds + ADC folds + two heap stages
  pinned("ann_pq_topk", queries.SimilarityQueries.annPqTopk)
}
