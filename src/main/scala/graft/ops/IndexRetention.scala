package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Epoch-based retention for the persisted index artifacts the
  * streaming twins probe between runs (t20's gram index, and —
  * pattern-identical — t16's container postings/df tables): without an
  * expiry pass those tables grow monotonically over an endless feed.
  * The production contract this encodes: an index entry UNSEEN for
  * `keepEpochs` ingest epochs leaves the index; a single co-partitioned
  * shuffle on the key column per epoch (stored ∪ delta → max-agg →
  * filter), then a versioned rewrite readers swap to atomically — the
  * same publish shape as `x_shard_merge`. At 100 TB the stored side is
  * bucketed by `h`, so the merge agg is exchange-free on the big side.
  * Correctness of the rolling form is oracle-checked end-to-end by
  * `t21_index_retention` (sequential epochs ≡ the closed-form
  * max-epoch-in-window relation); boundedness is pinned by
  * StreamOpsSpec's multi-epoch feed test. */
object IndexRetention {

  /** Merge one epoch's delta of (keyCols..., last_seen_epoch) rows into
    * the stored index and expire entries unseen for `keepEpochs` epochs
    * (an entry survives iff last_seen_epoch > currentEpoch -
    * keepEpochs). Pure: returns the new index frame; the caller
    * publishes it as the next version. Key defaults to the single gram
    * column `h` (t20's index); t22 keys the container postings by
    * (id_b, shingle). */
  def mergeAndExpire(stored: DataFrame, delta: DataFrame,
                     currentEpoch: Long, keepEpochs: Int,
                     keyCols: Seq[String] = Seq("h")): DataFrame =
    stored.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("last_seen_epoch")).as("last_seen_epoch"))
      .filter(col("last_seen_epoch") > lit(currentEpoch - keepEpochs))
}
