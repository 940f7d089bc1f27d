package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Query registry is assembled from per-domain modules; each module pairs
  * the Spark implementation with a DuckDB oracle where the semantics are
  * ANSI-SQL-expressible (non-expressible operators are registered without
  * an oracle → the driver records a rows-only check).
  */
object SparkEntry {
  private def modules: Seq[Q] =
    Relational.defs ++ Pipeline.defs ++ Normalization.defs ++ Linkage.defs ++ LlmData.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
