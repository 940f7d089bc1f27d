package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.consensus.{DedupSpec, EncDeduplicater}
import graft.sources.{Csv, Fixtures}
import graft.unpack.Unpack

/** Reference-pipeline operators surfaced as driver-visible queries
  * (SURVEY X1/X3, C1–C13, S1).
  *
  * These run on the reference's own 8-row fixture corpus (bundled as a
  * classpath resource) rather than the TPC-H-ish tables: the operators'
  * semantics are defined by that corpus. Not ANSI-SQL-expressible → no
  * DuckDB oracle → the driver records rows-only checks; the value-level
  * assertions live in `UnpackSpec` / `EncDeduplicaterSpec` golden tests.
  */
object Pipeline {

  /** X1/X3/S1: CSV scan → JSON repeat-group unpack → numbered columns. */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val raw = Csv.readStrings(spark, Fixtures.path("raw_enc_data.csv"), indexCol = true)
    Unpack.unpack(raw, "json_data",
      additionalSplitsOn = c => c.contains("category"), splitRe = "[\\|;,\\s]")
      .orderBy("row_id")
  }

  /** C1–C13: per-document consensus deduplication over the fixture.
    * object_id (uuid4 per document) is dropped to keep the dump
    * deterministic across runs.
    */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val df = Csv.readStrings(spark, Fixtures.path("normalised_enc_data.csv"), indexCol = true)
    EncDeduplicater.run(df, DedupSpec(
      idCol = "document_id",
      personCols = Seq("first_name_cleaned_0", "first_name_cleaned_1", "last_name_cleaned_0"),
      dateCols = Seq(
        "birthdate_day_cleaned", "birthdate_month_cleaned", "birthdate_year_cleaned",
        "imprisonment_day_cleaned", "imprisonment_month_cleaned", "imprisonment_year_cleaned"),
      otherCols = Seq(
        "imprisonment_camp_cleaned", "place_of_birth_0_cleaned", "place_of_birth_1_cleaned"),
      otherStrictCols = (0 to 5).map(i => s"prisoner_category_${i}_cleaned"),
      metadataCols = Seq("object_id", "workflow_id")))
      .drop("object_id")
      .orderBy(col("deleted"), col("document_id"), col("row_id"))
  }

  val defs: Seq[Q] = Seq(
    Q("q16_unpack_repeat_groups", q16, None),
    Q("q17_consensus_dedup", q17, None))
}
