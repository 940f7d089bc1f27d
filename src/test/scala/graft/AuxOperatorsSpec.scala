package graft

import org.apache.spark.sql.functions._
import graft.normalize.{Dates, Geo, Nationality}
import graft.sources.SqlScans
import graft.unpack.Zooniverse

/** Remaining operator families: geo IDs (F20), nationality (F21), date
  * correction (D3), TD re-segmentation (E13), zooniverse parsing (X2),
  * SQL-defined scans (S7).
  */
class AuxOperatorsSpec extends SparkSpec {
  private val session = SparkSpec.spark
  import session.implicits._

  test("F20 wikidata/geoname id parsing + QA") {
    val df = Seq(("Q42"), ("q7"), ("1234"), ("wd:Q42"), ("unklar"), (""))
      .toDF("wikidata_id")
    val out = Geo.cleanWikidataIds(df, "wikidata_id")
      .select("wikidata_id", "wikidata_id_qa").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    assert(out(0) === ("Q42", false))
    assert(out(1) === ("q7", false)) // kept verbatim (valid shape)
    assert(out(2) === ("Q1234", true)) // changed -> flagged
    assert(out(3) === ("", true))
    assert(out(4) === ("", true))

    val geo = Seq(("2950159"), ("x99"), ("")).toDF("geoname_id")
    val g = Geo.cleanGeonameIds(geo, "geoname_id")
      .select("geoname_id", "geoname_id_qa").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    assert(g(0) === ("2950159", false))
    assert(g(1) === ("", true))
  }

  test("F21 nationality standardizer: dictionary match, split, classify") {
    val natDict = Map("deutsch" -> "Deutschland", "polnisch" -> "Polen",
      "franzoesisch" -> "Frankreich")
    val unclear = Map("staatenlos" -> "?")
    val df = Seq("deutsch", "deutsch, polnisch", "staatenlos", "martian", "Polen")
      .toDF("nat")
    val out = Nationality.standardize(df, "nat", natDict, unclear).collect()
    def row(i: Int) = out(i)
    assert(row(0).getAs[String]("nationality_1_standardized") === "Deutschland")
    assert(row(0).getAs[Boolean]("nationality_standardized_qa") === false)
    assert(row(1).getAs[String]("nationality_1_standardized") === "Deutschland")
    assert(row(1).getAs[String]("nationality_2_standardized") === "Polen")
    assert(row(2).getAs[String]("nationality_1_standardized") === "?")
    assert(row(2).getAs[Boolean]("nationality_standardized_qa") === true)
    assert(row(3).getAs[String]("nationality_1_standardized") === "martian")
    assert(row(3).getAs[Boolean]("nationality_standardized_qa") === true)
    assert(row(4).getAs[String]("nationality_1_standardized") === "Polen") // already standard
    assert(row(4).getAs[String]("nationality_quality_level") === "technisch standardisiert")
  }

  test("F21 longest-match keeps superstring keys only") {
    val dict = Map("polnisch" -> "Polen", "nisch" -> "WRONG")
    val m = Nationality.findMatches(dict, "polnisch")
    assert(m === Seq("polnisch" -> "Polen"))
  }

  test("D3 date correction dismisses corrections equal to the original") {
    val df = Seq(
      ("1943", "03", "12", "12.03.1943"), // same -> dismissed
      ("1943", "03", "12", "15.04.1944")) // real correction
      .toDF("birth_year_cleaned", "birth_month_cleaned", "birth_day_cleaned", "correction")
    val out = Dates.dateCorrection(df, "correction", "birth", "birth_corrected").collect()
    assert(out(0).getAs[String]("birth_corrected_year_cleaned") === "")
    // ALL THREE parts must be dismissed, not just the year — the staged
    // comparison regression q59's oracle caught (a chained withColumn
    // re-resolved the equality after the year was already blanked)
    assert(out(0).getAs[String]("birth_corrected_month_cleaned") === "")
    assert(out(0).getAs[String]("birth_corrected_day_cleaned") === "")
    assert(out(1).getAs[String]("birth_corrected_year_cleaned") === "1944")
    assert(out(1).getAs[String]("birth_corrected_day_cleaned") === "15")
  }

  test("E13 clean_td_cases keeps TD groups atomic") {
    val df = Seq(
      (1L, "c0", "TD9"), (2L, "c1", "TD9"), (3L, "c1", null.asInstanceOf[String]))
      .toDF("id", "cluster_id", "TD_number")
    val out = graft.linkage.Clustering.cleanTdCases(df).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("cluster_id")).toMap
    assert(out(1L) === out(2L), "TD group atomic")
    assert(out(3L) === "c1", "non-TD rows keep their cluster")
  }

  test("X2 zooniverse annotations: simple, nested and dropdown tasks") {
    val json =
      """[
        |  {"task":"T0","task_label":"Last name","value":"Muller"},
        |  {"task":"T1","task_label":null,"value":[
        |    {"task":"T1.1","task_label":"City","value":"Berlin"},
        |    {"task":"T1.2","value":[{"label":"Category"}]},
        |    {"value":"POW"}
        |  ]}
        |]""".stripMargin
    val parsed = Zooniverse.parseAnnotations(json)
    assert(parsed("Last name") === "Muller")
    assert(parsed("T1: City") === "Berlin")
    assert(parsed("T1: Category") === "POW")
  }

  test("X2 zooniverse parser terminates on mutated exports: Exception contract, no Errors") {
    // same discipline as the media/XLSX fuzz, adapted to this parser's
    // throw-on-malformed contract: every mutation either parses or
    // throws an Exception (MalformedAnnotationException or Jackson's
    // own), and parser bombs (StackOverflowError from unbounded
    // recursion) never escape a per-row UDF
    val rnd = new scala.util.Random(321L)
    val base = """[{"task":"T0","task_label":"Language","value":"de"},""" +
      """{"task":"T1","value":[{"task_label":"Source","value":"x"},""" +
      """{"value":[{"select_label":"none"}]},{"value":"discard"},""" +
      """{"value":[{"label":"Camp","select_label":"Camp"}]},{"value":"tok"}]},null]"""
    def attempt(s: String): Unit =
      try { Zooniverse.parseAnnotations(s); () }
      catch {
        case _: Exception => ()
        case e: Error => fail(s"parser bomb escaped as ${e.getClass.getName}")
      }
    for (_ <- 1 to 800) {
      val chars = base.toCharArray
      for (_ <- 0 to rnd.nextInt(4)) chars(rnd.nextInt(chars.length)) = rnd.nextPrintableChar()
      attempt(new String(chars))
    }
    for (cut <- 0 until base.length by 2) attempt(base.take(cut))
    // hostile nesting: 60k-deep arrays must surface as an Exception
    // (Jackson's stream constraints), never a StackOverflowError
    attempt("[" * 60000 + "]" * 60000)
  }

  test("X2 zooniverse schema validation: malformed exports fail explicitly") {
    import Zooniverse.MalformedAnnotationException
    // single-select_label "empty" task consumes its following value task
    val withEmpty =
      """[{"task":"T1","task_label":null,"value":[
        |  {"value":[{"select_label":"ignored"}]},
        |  {"value":"discarded"},
        |  {"task":"T1.2","task_label":"Kept","value":"yes"}
        |]}]""".stripMargin
    assert(Zooniverse.parseAnnotations(withEmpty) === Map("T1: Kept" -> "yes"))
    // null entries are the reference's NaN -> skipped; null input -> empty
    assert(Zooniverse.parseAnnotations("[null]") === Map.empty)
    assert(Zooniverse.parseAnnotations(null) === Map.empty)
    // malformed: not JSON at all
    val e1 = intercept[MalformedAnnotationException](Zooniverse.parseAnnotations("not json"))
    assert(e1.getMessage.contains("not valid JSON"))
    // malformed: a task matching no schema (value is a number -> neither
    // parent, simple, nor null); the reference `assert False`s here
    val e2 = intercept[MalformedAnnotationException](
      Zooniverse.parseAnnotations("""[{"task":"T0","task_label":"L","value":7}]"""))
    assert(e2.getMessage.contains("not a valid task instance"))
    // malformed: sub-task matching no schema inside a parent
    val e3 = intercept[MalformedAnnotationException](
      Zooniverse.parseAnnotations(
        """[{"task":"T1","task_label":null,"value":[{"value":3}]}]"""))
    assert(e3.getMessage.contains("neither task_types apply"))
    // malformed: simple task without a label
    val e4 = intercept[MalformedAnnotationException](
      Zooniverse.parseAnnotations("""[{"value":"orphan"}]"""))
    assert(e4.getMessage.contains("without label"))
    // malformed: dropdown pair cut off at the end of the queue
    val e5 = intercept[MalformedAnnotationException](
      Zooniverse.parseAnnotations(
        """[{"task":"T1","task_label":null,"value":[{"value":[{"label":"L"}]}]}]"""))
    assert(e5.getMessage.contains("without a following value task"))
  }

  test("clean_copy_2, entry numbering and metadata filtering helpers") {
    import graft.normalize.{Clean, Processing}
    val c2 = Seq(("  none  "), (""), ("ok value")).toDF("v")
      .select(Clean.cleanCopy2(col("v"))).collect().map(_.getString(0))
    assert(c2.toSeq === Seq("-", "-", "ok value")) // empty -> '-' (the _2 variant)

    val numbered = Processing.entryNumber(
      Seq(("f1", 0L), ("f1", 1L), ("f2", 2L)).toDF("fname", "row_id"), Seq("fname"))
      .orderBy("row_id").collect().map(_.getAs[Int]("entry_number"))
    assert(numbered.toSeq === Seq(1, 2, 1))

    val cleaned = Processing.generalCleaningAndFiltering(
      Seq(("a", "normal", "x"), ("b", "failover_fallback", "y"))
        .toDF("data", "metadata_selection_state", "user_id"))
    assert(cleaned.columns.toSeq === Seq("data"))
    assert(cleaned.count() === 1)
  }

  test("S7 SQL-defined scans run the reference query shapes over views") {
    Seq((1L, 1L, "Muller", 1, "Hans", 1, "19430312", 111L, "123", 5L))
      .toDF("lObjId", "lCountId", "strLName", "lLNameType", "strGName",
        "lGNamePos", "strDoB", "lNumber", "strPrisNo", "lSchemaId")
      .createOrReplaceTempView("persdata")
    Seq((1L, 1L, 1, 99, 10L)).toDF("lObjId", "lCountId", "lAttTypeId", "lSubTypeNo", "lValueId")
      .createOrReplaceTempView("attribute")
    Seq((10L, 1, 99, "TD77")).toDF("lValueId", "lAttTypeId", "lSubTypeNo", "strValue_l1")
      .createOrReplaceTempView("attribute_value")
    Seq((5L, "B100")).toDF("lSchemaId", "strSchemaCode")
      .createOrReplaceTempView("archive_schema")
    Seq((1L, 1L, 1, 1, 5)).toDF("lObjId", "lCountId", "lAttTypeId", "lSubTypeNo", "strQLevel")
      .createOrReplaceTempView("attribute_quality")
    Seq((1L, 5L)).toDF("lObjId", "lSchemaId").createOrReplaceTempView("val_nodes")

    assert(SqlScans.qaLevelQuery(spark).collect().map(_.getString(0)).toSeq === Seq("Muller"))
    val pd = SqlScans.persdataQuery(spark).collect()
    assert(pd.length === 1)
    assert(pd.head.getAs[String]("TDNumber") === "TD77")
    assert(pd.head.getAs[String]("strSchemaCode") === "B100")
    val b = SqlScans.bestandQuery(spark, "B100").collect()
    assert(b.length === 1)
    assert(b.head.getAs[String]("TD_number") === "TD77")
  }
}
