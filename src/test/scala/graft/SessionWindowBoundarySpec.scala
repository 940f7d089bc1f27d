package graft

import org.apache.spark.sql.functions._

/** Pins `session_window`'s exact-gap boundary semantics, which q36's
  * DuckDB oracle depends on: the oracle breaks a session on
  * `ts - lag(ts) > INTERVAL '30 minutes'` (STRICTLY greater), so two
  * events exactly the gap apart must land in ONE session on the Spark
  * side too. Verified empirically on Spark 4.1.2 (this suite): the
  * merge condition is inclusive of the boundary instant. If a Spark
  * upgrade ever flips this to a strict `[start, start+gap)` split,
  * this canary fails before the q36 hash compare does — same policy
  * as the SessionHygiene LogicalRDD and Tables.events corpus pins.
  */
class SessionWindowBoundarySpec extends SparkSpec {
  test("session_window merges a gap of exactly the window size, splits one microsecond past it") {
    val session = spark
    import session.implicits._
    val gapUs = 1800000000L // 30 minutes in microseconds
    val df = Seq(
      ("exact", 0L), ("exact", gapUs),      // exactly 30 min apart
      ("under", 0L), ("under", gapUs - 1),  // strictly inside
      ("over", 0L), ("over", gapUs + 1))    // one microsecond past
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val sessions = df
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sessions("exact") === 1L,
      "exact-gap events must merge (the q36 oracle's strict `>` break condition)")
    assert(sessions("under") === 1L)
    assert(sessions("over") === 2L,
      "a gap strictly past the window must split")
  }
}
