package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Structured Streaming semantics over the events shape (§2.12). */
class StreamingSpec extends SparkSpec {
  private val session = SparkSpec.spark
  import session.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window aggregates by event time") {
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.windowedEventCounts(events, "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark far enough to close both windows
      input.addData((ts(40), "late", 0.0))
      q.processAllAvailable()
      val rows = session.table("win_agg")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 10:10:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("availableNow batch loop drains the backlog in bounded batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val batch = graft.core.Tables.events(spark, sf).limit(100)
    batch.write.mode("overwrite").parquet(dir)
    val stream = Streams.eventsFileStream(spark, dir, batch)
    val seen = collection.mutable.ArrayBuffer.empty[Long]
    val q = Streams.batchLoop(stream, ckpt) { (df, _) => seen += df.count() }.start()
    q.awaitTermination(60000)
    assert(seen.sum === 100L, s"batches: $seen")
  }

  test("flatMapGroupsWithState sessionization: gaps split, timeout flushes, matches session_window") {
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val sessions = Streams.userSessions(events, gapMs = 10L * 60 * 1000,
      watermark = "5 minutes")
    val q = sessions.toDF().writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two sessions split by an 18-minute in-batch gap;
      // user 2: one session
      input.addData((1L, ts(0)), (1L, ts(5)), (1L, ts(23)), (2L, ts(7)))
      q.processAllAvailable()
      // watermark advance (59 - 5min wm > 33min timeout) flushes the rest
      input.addData((9L, ts(59)))
      q.processAllAvailable()
      val got = session.table("sessions_out")
        .select("user_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
      assert(got.contains((1L, "2024-01-01 10:00:00.0", 2L)), s"first session of user 1: $got")
      assert(got.contains((1L, "2024-01-01 10:23:00.0", 1L)), "second session of user 1")
      assert(got.contains((2L, "2024-01-01 10:07:00.0", 1L)), "user 2 session")
      // the declarative twin agrees on the same data, batch mode
      val batch = Seq((1L, ts(0)), (1L, ts(5)), (1L, ts(23)), (2L, ts(7)))
        .toDF("user_id", "ts")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("s"), col("n"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
      assert(batch === got.filter(_._1 != 9L))
    } finally q.stop()
  }

  test("sessionization handles out-of-order events: backward extension, own sessions, bridging") {
    // gap 10 min, watermark 1 h. Batch 1 opens [60,62]; batch 2's late
    // events must NOT be absorbed blindly: 50 extends the session's
    // START backward (50 >= 60-gap), 30 opens its OWN session (more
    // than a gap before everything); batch 3's 40 touches BOTH open
    // sessions ([20,40] and [40,72]) and must bridge them into ONE
    // [30,62] session carrying all five events; batch 4 advances the
    // watermark past end+gap and finalizes exactly that one session.
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val sessions = Streams.userSessions(events, gapMs = 10L * 60 * 1000,
      watermark = "1 hour")
    val q = sessions.toDF().writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(60)), (1L, ts(62)))
      q.processAllAvailable()
      input.addData((1L, ts(50)), (1L, ts(30)))
      q.processAllAvailable()
      input.addData((1L, ts(40)))
      q.processAllAvailable()
      input.addData((2L, ts(180))) // watermark -> 120, finalizes [30,62]
      q.processAllAvailable()
      val got = session.table("sessions_ooo")
        .filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(2)))
      assert(got.toSeq === Seq(("2024-01-01 10:30:00.0", "2024-01-01 11:02:00.0", 5L)),
        s"out-of-order events must merge into ONE bridged session: ${got.toSeq}")
    } finally q.stop()
  }

  test("sessionization equals the batch session_window twin on seeded random out-of-order streams") {
    // property sweep: random (user, minute) events delivered in random
    // batch splits with random within-batch order — the streaming
    // interval-merge must produce EXACTLY the sessions the declarative
    // batch twin computes on the same data, for every seed. The
    // watermark is wide enough that nothing is late-dropped, and a
    // far-future sentinel flushes all open sessions at the end.
    implicit val sqlCtx = session.sqlContext
    val gapMin = 10
    for (seed <- Seq(1L, 7L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val events = Seq.fill(120)((1L + rnd.nextInt(4), ts(rnd.nextInt(55))))
      val input = MemoryStream[(Long, Timestamp)]
      val stream = Streams.userSessions(input.toDF().toDF("user_id", "ts"),
        gapMs = gapMin * 60L * 1000, watermark = "2 hours")
      val name = s"sessions_prop_$seed"
      val q = stream.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val batches = rnd.shuffle(events).grouped(1 + rnd.nextInt(50)).toSeq
        for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
        input.addData((999L, Timestamp.valueOf("2024-01-02 23:00:00"))) // flush
        q.processAllAvailable()
        val got = session.table(name).filter(col("user_id") =!= 999L)
          .select("user_id", "session_start", "session_end", "n_events").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).toString,
            r.getTimestamp(2).toString, r.getLong(3))).toSet
        val expected = events.toDF("user_id", "ts")
          .groupBy(session_window(col("ts"), s"$gapMin minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), max(col("ts")).as("last"))
          .select(col("user_id"), col("session_window.start"), col("last"), col("n"))
          .collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).toString,
            r.getTimestamp(2).toString, r.getLong(3))).toSet
        assert(got === expected,
          s"seed $seed: streaming sessions diverge from the batch twin\n" +
            s"only-streaming: ${got -- expected}\nonly-batch: ${expected -- got}")
      } finally q.stop()
    }
  }

  test("sessionization gap boundary: exactly-at-gap merges, strictly-past splits (streaming = batch)") {
    // the r19 hostile-events pin, streaming edition: Spark's batch
    // session_window MERGES an event landing exactly at last+gap
    // (verified against 4.1.2 in tools/hostile_diff.py) — the
    // streaming interval-merge must agree on the same boundary, which
    // the random minute-granularity sweep above only covers by chance.
    implicit val sqlCtx = session.sqlContext
    val events = Seq(
      // user 1: exactly-at-gap chain — ONE session of three
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:30:00")),
      (1L, Timestamp.valueOf("2024-01-01 01:00:00")),
      // ...then strictly past the edge by 1 ms — a SECOND session
      (1L, Timestamp.valueOf("2024-01-01 01:30:00.001")),
      // user 2: duplicate instants — one session, n = 3
      (2L, Timestamp.valueOf("2024-01-01 05:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 05:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 05:00:00")))
    val input = MemoryStream[(Long, Timestamp)]
    val stream = Streams.userSessions(input.toDF().toDF("user_id", "ts"),
      gapMs = 30L * 60L * 1000, watermark = "2 hours")
    val q = stream.toDF().writeStream.format("memory").queryName("sessions_boundary")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData((999L, Timestamp.valueOf("2024-01-02 23:00:00"))) // flush
      q.processAllAvailable()
      val got = session.table("sessions_boundary").filter(col("user_id") =!= 999L)
        .select("user_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
      val expected = events.toDF("user_id", "ts")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start"), col("n"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
      assert(got === expected,
        s"boundary sessions diverge\nstreaming: $got\nbatch: $expected")
      // the semantics themselves, pinned against both engines: the
      // exactly-at-gap chain is ONE session (inclusive boundary)
      assert(expected === Set(
        (1L, "2024-01-01 00:00:00.0", 3L),
        (1L, "2024-01-01 01:30:00.001", 1L),
        (2L, "2024-01-01 05:00:00.0", 3L)), s"batch semantics moved: $expected")
    } finally q.stop()
  }

  test("streaming media triage parses AVI headers and drops corrupt clips in-flight") {
    implicit val sqlCtx = session.sqlContext
    import graft.text.Multimodal.AviCodec
    val input = MemoryStream[(Long, Array[Byte])]
    val clips = input.toDF().toDF("media_id", "content")
    val q = Streams.aviTriage(clips, "content")
      .writeStream.format("memory").queryName("triage_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, AviCodec.encodeAviPngSeq(8, 6, 3, 40L, 1L)),
        (2L, AviCodec.encodeAviPngSeq(4, 4, 5, 20L, 2L)),
        (3L, "definitely not a video".getBytes),      // corrupt: dropped
        (4L, Array.empty[Byte]))                      // corrupt: dropped
      q.processAllAvailable()
      val got = session.table("triage_out")
        .select("media_id", "handler", "width", "height", "n_frames", "duration_ms")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got === Set(
        (1L, "mpng", 8, 6, 3L, 120L),
        (2L, "mpng", 4, 4, 5L, 100L)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_id")
    val deduped = Streams.dedupStream(events, Seq("event_id"), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // the second "a" carries 1 min of replay jitter: a (key, ts)
      // dedup would keep both copies; the key-only contract drops it
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()
      assert(session.table("dedup_out").count() === 2)
      assert(session.table("dedup_out").groupBy("event_id").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
        Map("a" -> 1L, "b" -> 1L))
    } finally q.stop()
  }
}
