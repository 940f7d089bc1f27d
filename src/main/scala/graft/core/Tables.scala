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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long and convert to a microsecond
    * timestamp (integer division keeps the full 63-bit value exact;
    * DuckDB's TIMESTAMP is also µs, so both engines see identical values).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Floor division (via pmod), not `div`: `div` truncates toward zero,
    // which would round negative (pre-1970) nanos to the wrong microsecond
    // vs DuckDB's flooring conversion.
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
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
