package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Missing-data model of the reference engine.
  *
  * The reference has no real NULLs: sentinel strings mark "no entry" and
  * QA-suspect values (reference: `src/aroa_etl/utils.py:5-6`). Internally we
  * prefer real `null` and only materialize sentinels at the string edges.
  */
object Sentinels {
  /** Values that carry no information (reference `utils.py:5`). */
  val NaValues: Seq[String] = Seq(
    "-1", "-1.0", "None", "", "NULL", "unbekannt", "unbekant", "-",
    "0", "0.0", "NA", "00", "0000")

  /** Values that mark a QA-suspect entry (reference `utils.py:6`). */
  val QaValues: Seq[String] = Seq("?", "unklar", "Unklar")

  /** Column predicate: value carries no information
    * (reference `utils.py:8-29` `value_is_empty_q`).
    */
  def isEmptyValue(c: Column): Column =
    c.isNull || c.isin(NaValues: _*)

  def isNotEmptyValue(c: Column): Column = !isEmptyValue(c)

  /** Column predicate: value carries information and is not a QA marker
    * (reference `utils.py:31-40` `has_value_q`).
    */
  def hasValue(c: Column): Column =
    c.isNotNull && !c.isin((NaValues ++ QaValues): _*)

  /** Map NA-sentinel strings to real nulls. */
  def sentinelsToNull(c: Column): Column =
    when(isEmptyValue(c), lit(null)).otherwise(c)

  /** Canonical "no entry" string at the CSV edge. */
  val NoEntry = "-"

  /** Scala-side (driver / aggregator buffer) equivalents. */
  def isEmptyValueStr(s: String): Boolean = s == null || NaValues.contains(s)
  def hasValueStr(s: String): Boolean =
    s != null && !NaValues.contains(s) && !QaValues.contains(s)
}

/** Row-identity discipline.
  *
  * The reference relies on the pandas row index for gluing derived frames
  * back together (`enc/processing.py:300-309`, `enc/deduplication.py:266-280`).
  * Spark has no implicit row identity, so every pipeline captures a surrogate
  * key once at ingest and joins on it thereafter.
  */
object RowId {
  val ColName = "row_id"

  /** Determinism precondition: `monotonically_increasing_id` values are
    * a pure function of partition layout, so the surrogate is stable
    * across re-evaluations ONLY over a deterministic lineage (a plain
    * file scan). Downstream of a shuffle whose layout can change, or a
    * non-deterministic sample, PIN the frame (localCheckpoint /
    * `.trackedCheckpoint()`) before deriving frames you intend to glue
    * back by row_id — the EncDeduplicater consensus pin is the
    * in-repo example of exactly that failure class.
    */
  def withRowId(df: DataFrame): DataFrame =
    if (df.columns.contains(ColName)) df
    else df.withColumn(ColName, monotonically_increasing_id())
}
