package graft

import graft.sources.{Csv, Fixtures}
import graft.unpack.Unpack

/** Golden port of the reference's unpacking stage test
  * (`tests/enc/unpacking_test.py:9-20`) over `testing_data/raw_enc_data.csv`.
  */
class UnpackSpec extends SparkSpec {

  private lazy val unpacked = {
    val raw = Csv.readStrings(spark, Fixtures.path("raw_enc_data.csv"), indexCol = true)
    Unpack.unpack(raw, "json_data",
      additionalSplitsOn = c => c.contains("category"), splitRe = "[\\|;,\\s]")
  }.cache()

  test("unpacked column list matches the reference exactly (21 columns)") {
    assert(unpacked.columns.filterNot(_ == "row_id").toSeq === Seq(
      "workflow_id", "document_id", "prisoner_category_0", "prisoner_category_1",
      "prisoner_category_2", "prisoner_category_3", "prisoner_category_4",
      "prisoner_category_5", "prisoner_number", "imprisonment_year",
      "imprisonment_month", "imprisonment_day", "imprisonment_camp",
      "place_of_birth_0", "place_of_birth_1", "birthdate_year",
      "birthdate_month", "birthdate_day", "first_name_0", "first_name_1",
      "last_name"))
  }

  test("first_name_0 values match (multi-name cells stay unsplit)") {
    val fn = unpacked.orderBy("row_id").select("first_name_0").collect().map(_.getString(0))
    assert(fn.toSeq === Seq(
      "Dr.Alice", "Dr. Alice", "Alice", "Bob1 Bob2", "Bob1", "Bob1", "Bob1", "Bob1"))
  }

  test("JSON nulls become the literal 'None' (python str) in multi-field groups") {
    val rows = unpacked.orderBy("row_id")
      .select("imprisonment_year", "prisoner_category_0", "last_name").collect()
    assert(rows(1).getString(0) === "None") // null year in doc 1 row 1
    assert(rows(1).getString(1) === "None") // single-field group keeps lone 'None'
    assert(rows(5).getString(2) === "None") // null last name
  }

  test("repeat groups pad with null beyond each row's arity") {
    val r0 = unpacked.orderBy("row_id").collect()(0)
    assert(r0.getAs[String]("prisoner_category_4") === "6")
    assert(r0.getAs[String]("prisoner_category_5") === null) // row 0 has 5 of max 6
    assert(r0.getAs[String]("place_of_birth_1") === null)
  }

  test("singleton groups unwrap to plain column names") {
    val r0 = unpacked.orderBy("row_id").collect()(0)
    assert(r0.getAs[String]("prisoner_number") === "111")
    assert(r0.getAs[String]("imprisonment_camp") === "Unklar")
  }

  test("X3 additional splits separate mis-joined values outside parentheses") {
    assert(Unpack.additionalSplits(Seq("Alice, Blice", "Clice"), "[\\|;,\\s]") ===
      Seq("Alice", "", "Blice", "Clice"))
    assert(Unpack.reSubExcludeParenthesis("a,b (c,d) e", ",", "|") === "a|b (c,d) e")
  }

  test("filter_na dedupes and drops empties only when alternatives exist") {
    assert(Unpack.filterNa(Seq("1", "1", "", "2")) === Seq("1", "2"))
    assert(Unpack.filterNa(Seq("", "")) === Seq(""))
    assert(Unpack.filterNa(Seq("None")) === Seq("None"))
  }
}
