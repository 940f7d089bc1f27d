package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All scans go through here so every query benefits from the same
  * source settings; the parquet reader gives Catalyst filter pushdown
  * and column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some corpus
    * generations (which Spark's vectorized reader rejects — read nanos
    * as long and floor-convert to microseconds) and as TIMESTAMP(MICROS)
    * in others (which reads natively as TIMESTAMP_NTZ). Dispatch on the
    * schema actually on disk so both generations load identically:
    * either way downstream sees a session-zone (UTC) microsecond
    * timestamp, matching DuckDB's µs TIMESTAMP value-for-value.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos generation. Floor division (via pmod), not `div`: `div`
        // truncates toward zero, which would round negative (pre-1970)
        // nanos to the wrong microsecond vs DuckDB's flooring conversion.
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        // micros-NTZ generation: under the UTC session zone this cast
        // reinterprets the naive value as the same UTC instant the nanos
        // path produced, so both generations hash identically.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        // a THIRD corpus generation would land here; an unconditional
        // cast would silently misinterpret it (e.g. an integer-seconds
        // column casts as seconds-since-epoch, off by 1e6 with no
        // error) — fail at load where the cause is visible
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected TIMESTAMP nanos-as-long, " +
            "TIMESTAMP, or TIMESTAMP_NTZ); teach Tables.events this corpus generation")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Every table through its typed accessor — `events` needs the
    * nanos-as-long path, so warmup/iteration code must come through here
    * rather than looping `table(...)` over [[names]]. Derived from
    * [[names]] so a new table can't be silently missing from warmup.
    */
  def all(spark: SparkSession, dir: String): Seq[(String, DataFrame)] =
    names.map { n =>
      n -> (if (n == "events") events(spark, dir) else table(spark, dir, n))
    }
}
