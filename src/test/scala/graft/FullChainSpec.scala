package graft

import org.apache.spark.sql.functions._
import graft.consensus.{DedupSpec, EncDeduplicater}
import graft.normalize.Processing
import graft.sources.{Csv, Fixtures}
import graft.unpack.Unpack

/** The reference's complete 3-stage pipeline end to end through THIS
  * engine: raw CSV → unpack → CSV stage boundary → normalize → consensus
  * dedup, asserting the stage-3 golden winners. The CSV round-trip
  * between stages is deliberate — it is the reference's actual stage
  * boundary (notebook → bucket → notebook), and pandas' NA parsing at
  * that boundary is semantically load-bearing ("None" cells become
  * missing). Also exercises the Csv sink.
  */
class FullChainSpec extends SparkSpec {

  test("raw transcriptions to consensus rows across all three stages") {
    // stage 1: unpack
    val raw = Csv.readStrings(spark, Fixtures.path("raw_enc_data.csv"), indexCol = true)
    val unpacked = Unpack.unpack(raw, "json_data",
      additionalSplitsOn = c => c.contains("category"), splitRe = "[\\|;,\\s]")

    // stage boundary: CSV out + pandas-NA read back
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stage").toString + "/unpacked"
    Csv.write(unpacked, stageDir)
    val reread = Csv.pandasNaToNull(Csv.readStrings(spark, stageDir))
      .withColumn("row_id", col("row_id").cast("long"))

    // stage 2: normalize
    val processed = Processing.processUnpackedData(reread,
      skipColumns = Set("workflow_id", "document_id"))

    // stage 3: consensus dedup
    val result = EncDeduplicater.run(processed, DedupSpec(
      idCol = "document_id",
      personCols = Seq("first_name_cleaned_0", "first_name_cleaned_1", "last_name_cleaned_0"),
      dateCols = Seq(
        "birthdate_day_cleaned", "birthdate_month_cleaned", "birthdate_year_cleaned",
        "imprisonment_day_cleaned", "imprisonment_month_cleaned", "imprisonment_year_cleaned"),
      otherCols = Seq(
        "imprisonment_camp_cleaned", "place_of_birth_0_cleaned", "place_of_birth_1_cleaned"),
      otherStrictCols = (0 to 5).map(i => s"prisoner_category_${i}_cleaned"),
      metadataCols = Seq("workflow_id")))

    val consensus = result.filter(col("deleted") === false)
      .orderBy("document_id").collect()
    assert(consensus.length === 2)
    assert(consensus.map(_.getAs[String]("last_name_cleaned_0")).toSeq ===
      Seq("Müller", "Schmidt"))
    assert(consensus.map(_.getAs[String]("first_name_cleaned_0")).toSeq ===
      Seq("Alice", "Bob1"))
    assert(consensus(1).getAs[String]("first_name_cleaned_1") === "Bob2")
    assert(consensus.map(_.getAs[String]("place_of_birth_0_cleaned")).toSeq ===
      Seq("Frankfurt", "Stadt"))
    val amb = consensus(0).getAs[String]("ambiguous_columns").split(", ").toSet
    assert(amb === Set(
      "imprisonment_year_cleaned", "prisoner_category_5_cleaned",
      "imprisonment_camp_cleaned", "place_of_birth_1_cleaned"))
  }
}
