package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the `events` table shape
  * (`event_id, ts, user_id, event_type, value`) — the streaming side of
  * the engine (the reference is batch-only; BASELINE.json's scale story
  * needs continuous ingest). Every transform below is written against a
  * plain DataFrame/Dataset so the SAME code runs in batch (finite input,
  * for oracle verification — see `events_hourly` / `events_sessionize`
  * in graft.analog.CoreAnalogs) and under `readStream` (incremental,
  * with watermark-bounded state).
  *
  * Scale notes: state size is the whole game in streaming. The hourly
  * aggregate keeps |event_type| × (watermark horizon / 1h) rows of
  * state; sessionization keeps one small struct per active user, evicted
  * by event-time timeout. Both shuffle only on their group keys.
  */
object EventStreams {

  /** Typed event row (timestamps in micros-precision java.sql.Timestamp). */
  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** One closed (or finally-flushed) session. */
  final case class Session(
      user_id: Long, start_ts: Timestamp, end_ts: Timestamp, n_events: Long)

  /** Per-user session-tracker state for flatMapGroupsWithState. */
  final case class SessionState(
      startUs: Long, lastUs: Long, nEvents: Long, nClosed: Long)

  private val GapUs: Long = 30L * 60 * 1000 * 1000 // 30-min inactivity gap

  /** Hourly tumbling-window aggregate (count + sum per event_type).
    * On a stream the 2h watermark bounds state and lets append mode
    * emit finalized windows; on a batch frame the watermark is a no-op
    * and the result equals the `events_hourly` oracle query.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-event-time-hour histogram shards of the `value` column: each
    * window folds its arrivals into the sparse (bin, c) grid of
    * [[graft.operators.Profile.histSketch]] — the stream publishes
    * SKETCH STATE, not quantiles, so any window range folds with
    * `histMerge` and resolves percentiles with `histQuantiles` without
    * replaying the stream (the latency-percentile-dashboard shape).
    * State is bounded by bins × (watermark horizon / 1h) rows whatever
    * the arrival rate, and because cells are SUMS the emitted shard is
    * hash-identical under any micro-batch boundary (law-tested in
    * EventStreamsSpec). The bin builder is shared with the batch
    * sketch, so screen and sketch cannot drift.
    */
  def histScreen(events: DataFrame, lo: Long = 0L, step: Long = 5L,
      bins: Int = 100): DataFrame =
    events
      .select(col("ts"),
        graft.operators.Profile.histBin(col("value"), lo, step, bins)
          .as("bin"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("hour"), col("bin"), col("c"))

  /** Per-user sessions via the built-in `session_window` (30-min gap):
    * one row per closed session. Streaming-legal in append mode with
    * the watermark; in batch it enumerates all sessions exactly.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"), col("n_events"))

  /** Custom sessionization with explicit state — the
    * `flatMapGroupsWithState` shape for logic `session_window` can't
    * express (e.g. emitting closed sessions with exact last-event end
    * bounds rather than gap-padded windows). Emits a [[Session]] each
    * time a gap closes one, and flushes the open session on state
    * timeout (stream) or group end (batch).
    *
    * In batch mode Spark hands each group's full iterator in one call
    * with no ordering guarantee, so events are sorted by ts here;
    * in streaming, per-microbatch iterators are likewise sorted and
    * merged against carried state.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[Session] = {
    import spark.implicits._
    // plain boolean captured by the state function (a Dataset must not
    // leak into the executor-side closure)
    val streaming = events.isStreaming
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // stream path: watermark passed the open session's horizon
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.startUs / 1000),
              new Timestamp(s.lastUs / 1000), s.nEvents))
          } else {
            val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = IndexedSeq.newBuilder[Session]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000
              cur match {
                case Some(s) if us - s.lastUs <= GapUs =>
                  cur = Some(s.copy(lastUs = us, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.startUs / 1000),
                    new Timestamp(s.lastUs / 1000), s.nEvents)
                  cur = Some(SessionState(us, us, 1, s.nClosed + 1))
                case None =>
                  cur = Some(SessionState(us, us, 1, 0))
              }
            }
            cur.foreach { s =>
              if (!streaming) {
                // batch: no timeout will ever fire — flush the open
                // session now so batch output is complete
                closed += Session(userId, new Timestamp(s.startUs / 1000),
                  new Timestamp(s.lastUs / 1000), s.nEvents)
                if (state.exists) state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(s.lastUs / 1000 + 30 * 60 * 1000)
              }
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen, with state bounded by the watermark horizon (ids older than
    * the watermark are evicted — the standard at-least-once → effective
    * exactly-once repair for replayed sources). Batch mode: plain
    * distinct-by-id (`dropDuplicatesWithinWatermark` is streaming-only
    * in Spark 4, and a finite frame needs no state bound) — same
    * keep-one-per-id semantics, so the batch run is the oracle twin of
    * the stream (`stream_dedup_replay`).
    */
  def dedupStream(events: DataFrame): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** STREAM-STREAM attribution join: each purchase matched to every
    * click by the same user in the `windowMinutes` before it — the
    * canonical ad-attribution shape, and the engine's exerciser of
    * Structured Streaming's stream-stream join (both inputs unbounded,
    * watermarked state on both sides). The event-time range condition
    * `c_ts ∈ [p_ts − window, p_ts]` plus the two watermarks is exactly
    * what lets Spark bound and evict join state: a click older than
    * (purchase watermark − window) can never match again.
    *
    * Written against plain DataFrames, so the SAME code runs in batch
    * for the oracle (`stream_attribution`; `withWatermark` is a no-op
    * on batch frames). Batch-at-scale note: the bucketized
    * [[graft.operators.TemporalJoins.rangeJoin]] is the 100 TB BATCH
    * plan for this shape — this operator is the CONTINUOUS one, where
    * state is bounded by the watermark horizon, not corpus size.
    */
  def attribution(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    require(windowMinutes > 0,
      s"windowMinutes must be > 0, got $windowMinutes")
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"),
        col("user_id").as("_c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("_c_user") &&
        col("c_ts") >= col("p_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select("purchase_id", "user_id", "p_ts", "click_id", "c_ts")
  }

  /** Streaming entry: parquet-directory source → hourly aggregate →
    * parquet sink with checkpointing. Returns the running query; callers
    * own its lifecycle (`awaitTermination` in a deployment,
    * `processAllAvailable` + `stop` in a drive-by check).
    */
  def startHourlyPipeline(spark: SparkSession, srcDir: String, sinkDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val in = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(srcDir)
    hourly(in).writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .start()
  }
}
