package graft

import graft.consensus.{DedupSpec, EncDeduplicater}
import graft.sources.{Csv, Fixtures}

/** Golden port of the reference's deduplication stage test
  * (`tests/enc/deduplication_test.py:9-53`) over the 8-row / 2-document
  * fixture (`testing_data/normalised_enc_data.csv`).
  */
class EncDeduplicaterSpec extends SparkSpec {

  private lazy val result = {
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
  }.cache()

  private lazy val consensus = result
    .filter(org.apache.spark.sql.functions.col("deleted") === false)
    .orderBy("document_id")
    .collect()
    .map(r => r.getValuesMap[Any](result.columns.toIndexedSeq))

  test("one consensus row per document plus the 8 raw rows") {
    assert(result.count() === 10)
    assert(consensus.length === 2)
  }

  test("last-name consensus: Mueller variants fold to the umlaut form") {
    assert(consensus.map(_("last_name_cleaned_0")).toSeq === Seq("Müller", "Schmidt"))
  }

  test("first-name consensus") {
    assert(consensus.map(_("first_name_cleaned_0")).toSeq === Seq("Alice", "Bob1"))
    assert(consensus(1)("first_name_cleaned_1") === "Bob2")
  }

  test("place-of-birth consensus: syllable repair picks Frankfurt") {
    assert(consensus.map(_("place_of_birth_0_cleaned")).toSeq === Seq("Frankfurt", "Stadt"))
  }

  test("document 1 ambiguous columns match the reference's exact set") {
    val amb = consensus(0)("ambiguous_columns").asInstanceOf[String].split(", ").toSet
    assert(amb === Set(
      "imprisonment_year_cleaned", "prisoner_category_5_cleaned",
      "imprisonment_camp_cleaned", "place_of_birth_1_cleaned"))
    assert(consensus(0)("is_ambiguous") === true)
    // ambiguous columns are blanked to "?" in the consensus row
    assert(consensus(0)("imprisonment_year_cleaned") === "?")
  }

  test("object ids are assigned when person columns are present") {
    assert(consensus.forall(_("object_id").asInstanceOf[String].nonEmpty))
    // raw rows carry their document's object_id
    val raw = result.filter(org.apache.spark.sql.functions.col("deleted") === true).collect()
    assert(raw.length === 8)
    assert(raw.forall(r => r.getAs[String]("object_id").nonEmpty))
  }

  test("raw rows carry the SAME object_id as their document's consensus row") {
    // the consensus Dataset feeds two plan branches (the verdicts join
    // into raw, and the union); its mapGroups generates object_id via
    // randomUUID, so without pinning one evaluation the two branches
    // would hold DIFFERENT uuids for the same document and the
    // reference's copy-down linkage (deduplication.py) silently breaks
    import org.apache.spark.sql.functions.col
    val byDoc = result.select("document_id", "deleted", "object_id").collect()
      .groupBy(_.getString(0))
    for ((doc, rows) <- byDoc) {
      val ids = rows.map(_.getString(2)).distinct
      assert(ids.length === 1,
        s"document $doc: raw and consensus rows disagree on object_id: ${ids.toSeq}")
    }
  }

  test("metadata columns are copied onto consensus rows") {
    assert(consensus.map(_("workflow_id")).toSeq === Seq("wo_001", "wo_001"))
  }

  test("C12 combine_columns joins fields with a keep filter") {
    val session = SparkSpec.spark
    import session.implicits._
    val df = Seq(("Frankfurt", "Main", "3"), ("Berlin", null, "x"))
      .toDF("city0", "city1", "extra")
    val out = EncDeduplicater.combineColumns(df,
      Seq("city0", "city1", "extra"), "full_city", ", ", keepRegex = Some("[a-zA-Z]"))
      .select("full_city").collect().map(_.getString(0))
    assert(out.toSeq === Seq("Frankfurt, Main", "Berlin, x"))
  }

  test("A9 match statistics per column") {
    val df = Csv.readStrings(spark, Fixtures.path("normalised_enc_data.csv"), indexCol = true)
    val spec = DedupSpec(
      idCol = "document_id",
      personCols = Seq("first_name_cleaned_0", "last_name_cleaned_0"),
      otherCols = Seq("imprisonment_camp_cleaned"))
    val res = EncDeduplicater.run(df, spec)
    val stats = EncDeduplicater.matchStats(df, spec, res).collect()
      .map(r => r.getString(0) -> r).toMap
    val camp = stats("imprisonment_camp_cleaned")
    // doc 1: only Unklar entries -> ambiguous; doc 2: 'Bu' matched
    assert(camp.getAs[Long]("with_entries") === 2)
    assert(camp.getAs[Long]("matched") === 1)
    assert(camp.getAs[Long]("ambiguous") === 1)
    val ln = stats("last_name_cleaned_0")
    assert(ln.getAs[Long]("matched") === 2)
  }

  test("matched values that were QA-flagged in a supporting raw row keep the flag") {
    // imprisonment_camp 'Unklar' rows are flagged, but doc 2's consensus is
    // 'Bu' (unflagged rows) -> no propagation; doc 1's camp is ambiguous '?'.
    assert(consensus(1)("imprisonment_camp_qa") === false)
  }
}
