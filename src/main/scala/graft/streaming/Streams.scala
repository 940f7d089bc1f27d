package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY §2.12).
  *
  * The reference has no streaming; its closest analogue is the manual
  * 1M-row batch loop (`run-matching-persdata.py:46-66`), which maps to
  * `Trigger.AvailableNow` + `foreachBatch` here. The `events` corpus
  * shape (ts, user_id, event_type, value) additionally gets the standard
  * event-time operators: watermarked tumbling/sliding windows and
  * streaming dedup — additive capability beyond reference parity.
  */
object Streams {

  /** Watermarked tumbling-window aggregation over an events-shaped
    * stream: count + sum(value) per (window, event_type). Late data
    * beyond the watermark is dropped, state is bounded — the shape that
    * survives an unbounded 100 TB/day feed.
    */
  def windowedEventCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      slide: Option[String] = None,
      watermark: String = "2 hours"): DataFrame = {
    val w = slide match {
      case Some(s) => window(col("ts"), window_, s)
      case None    => window(col("ts"), window_)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("double")).as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming exact dedup on a key with watermark-bounded state
    * (the dedup family's streaming sibling). The subset is the KEY
    * ALONE: `dropDuplicatesWithinWatermark` exists precisely so the
    * event-time column need not be part of the dedup key (state is
    * bounded by the watermark instead) — appending `ts` would keep
    * both copies of a retried event whose replay carries 1 ms of
    * timestamp jitter, the exact case a streaming dedup is for.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(startMs: Long, endMs: Long, n: Long)
  final case class Session(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState` (§2.12):
    * per-user sessions split on `gapMs` of event-time silence. Open
    * sessions live in bounded group state keyed by user and are flushed
    * by event-time TIMEOUT when the watermark passes `last event + gap` —
    * state never grows with history, only with concurrently-open
    * sessions, which is what survives an unbounded feed. Batch
    * `session_window(ts, gap)` (q36) is the declarative twin; this is
    * the escape hatch for state logic the built-in can't express.
    */
  def userSessions(
      events: DataFrame, gapMs: Long = 30L * 60 * 1000,
      watermark: String = "1 hour"): Dataset[Session] = {
    val session = events.sparkSession
    import session.implicits._
    events.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[SessionEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[SessionState], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[Seq[SessionState]]) =>
          def emit(s: SessionState) = Session(user,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)
          val wm = state.getCurrentWatermarkMs()
          // State is the user's OPEN sessions (non-overlapping, any
          // order), not one session: out-of-order events within the
          // watermark must open their OWN session when they fall more
          // than a gap before every open session, extend a session's
          // start backward when they precede it within the gap, and
          // even BRIDGE two open sessions into one — a single-session
          // state can do none of these (it silently absorbed a
          // 90-min-early event into the wrong session and never moved
          // session_start). Bounded: at most (watermark horizon / gap)
          // open sessions per user.
          var open: Seq[SessionState] = state.getOption.getOrElse(Nil)
          if (!state.hasTimedOut)
            for (t <- it.map(_.ts.getTime).toArray.sorted) {
              // sessions this event touches as the interval [t-gap, t+gap]
              val (touching, rest) = open.partition(s =>
                t >= s.startMs - gapMs && t <= s.endMs + gapMs)
              val merged =
                if (touching.isEmpty) SessionState(t, t, 1)
                else SessionState(
                  math.min(t, touching.map(_.startMs).min),
                  math.max(t, touching.map(_.endMs).max),
                  touching.map(_.n).sum + 1)
              open = merged +: rest
            }
          // a session is FINAL only when the watermark passes end+gap —
          // emitting an in-batch-closed session immediately (the old
          // behavior) is premature in Append mode: a later batch's
          // late-but-valid event could still extend it, and the emitted
          // row can never be retracted. Finality is the same rule the
          // declarative session_window twin applies.
          val (done, stillOpen) = open.partition(s => s.endMs + gapMs <= wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(stillOpen)
            // earliest possible finality; > wm is guaranteed by the
            // partition above (end+gap > wm for every still-open session)
            state.setTimeoutTimestamp(stillOpen.map(_.endMs).min + gapMs)
          }
          done.sortBy(_.startMs).map(emit).iterator
      }
  }

  /** Streaming media triage: header-only AVI metadata per row — the
    * cheap gate a training-data ingest runs on an unbounded clip feed
    * BEFORE committing to any frame decode (decode is orders of
    * magnitude dearer than header parsing, and the corrupt/unwanted
    * fraction of a crawl is large). Corrupt or non-AVI containers are
    * dropped via the codec's None contract, never an exception that
    * kills the stream. Stateless row-wise transform, so it composes
    * with any watermark/window/dedup downstream and needs no state
    * store of its own.
    */
  def aviTriage(clips: DataFrame, binaryCol: String): DataFrame = {
    val metaUdf = udf { (b: Array[Byte]) =>
      graft.text.Multimodal.AviCodec.aviMetadata(b)
    }
    clips
      .withColumn("m", metaUdf(col(binaryCol)))
      .filter(col("m").isNotNull)
      .select(col("*"),
        col("m._1").as("handler"),
        col("m._2").as("width"),
        col("m._3").as("height"),
        col("m._4").as("n_frames"),
        col("m._5").as("duration_ms"))
      .drop("m")
      .drop(binaryCol)
  }

  /** The reference's batch loop as a stream: process whatever is
    * available, one bounded run (`Trigger.AvailableNow`), each micro-
    * batch handed to `fn` — e.g. a per-batch person-matching pass.
    */
  def batchLoop(
      stream: DataFrame,
      checkpoint: String)(fn: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch(fn)

  /** File-source reader for an events-shaped parquet directory. */
  def eventsFileStream(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(dir)
}
