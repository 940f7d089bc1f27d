package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Column names must match between the two —
  * the driver sorts columns by name and hashes values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Sum of a double column with deterministic value: FP addition is
    * order-dependent, so both engines sum exact decimals and only cast
    * the final value back to double. Keeps Spark and DuckDB bit-equal.
    */
  val DecimalSumNote = "cast to decimal(18,2) before SUM, double after"
}
