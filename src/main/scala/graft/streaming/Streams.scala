package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

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
    * (the dedup family's streaming sibling).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols :+ "ts")

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
