package graft

import org.apache.spark.sql.functions._
import graft.normalize.Processing
import graft.sources.{Csv, Fixtures}

/** Golden test for the normalization pipeline, stronger than the
  * reference's own (`tests/enc/processing_test.py:9-24`): every cell of
  * every derived column is compared against `processed_ground_truth.csv`,
  * the exact output of the reference's `process_unpacked_data` run over
  * `testing_data/unpacked_enc_data.csv` (captured once with the reference
  * code under pandas; regenerable with tools/gen_ground_truth.py).
  */
class ProcessingSpec extends SparkSpec {

  private lazy val processed = {
    val unpacked = Csv.pandasNaToNull(
      Csv.readStrings(spark, Fixtures.path("unpacked_enc_data.csv"), indexCol = true))
    Processing.processUnpackedData(unpacked,
      skipColumns = Set("updated_at", "user_id", "workflow_id", "created_at", "document_id", "id"))
  }.cache()

  private lazy val truth = Csv.readStrings(spark,
    graft.sources.Fixtures.path("processed_ground_truth.csv"), indexCol = true)

  test("reference golden assertions (processing_test.py)") {
    val rows = processed.orderBy("row_id").collect()
    assert(processed.columns.contains("imprisonment_camp_data_source"))
    assert(rows.map(_.getAs[Boolean]("imprisonment_camp_qa")).count(identity) === 5)
    assert(rows.take(5).map(_.getAs[String]("last_name_cleaned_0")).toSeq ===
      Seq("Muller", "Müller", "Mueller", "Schmidt", "Schmïdt"))
    assert(rows.map(_.getAs[String]("first_name_cleaned_0")).toSeq ===
      Seq("Alice", "Alice", "Alice", "Bob1", "Bob1", "Bob1", "Bob1", "Bob1"))
  }

  test("every derived cell matches the reference's output exactly") {
    val truthRows = truth.orderBy("row_id").collect()
    val mineRows = processed.orderBy("row_id").collect()
    assert(truthRows.length === mineRows.length)
    val truthCols = truth.columns.filterNot(_ == "row_id")
    val missing = truthCols.filterNot(processed.columns.contains)
    assert(missing.isEmpty, s"columns missing from spark output: ${missing.toSeq}")

    def render(v: Any): String = v match {
      case null       => ""
      case b: Boolean => if (b) "True" else "False"
      case s: String  => s
      case other      => other.toString
    }
    val diffs = for {
      i <- truthRows.indices
      c <- truthCols
      expected = render(truthRows(i).getAs[Any](c))
      got = render(mineRows(i).getAs[Any](c))
      if expected != got
    } yield s"row $i col $c: expected '$expected' got '$got'"
    assert(diffs.isEmpty, s"${diffs.size} cell diffs, first 12:\n${diffs.take(12).mkString("\n")}")
  }

  test("normalizers survive an EMPTY input frame (max-arity aggregate is SQL NULL)") {
    // max(size(...)) over zero rows aggregates to NULL; getInt on that
    // row NPE'd — an upstream filter that drops every row (or an empty
    // partition test run) must yield an empty NORMALIZED frame, k=1
    // column family, not a crash
    val session = SparkSpec.spark
    import session.implicits._
    val empty = Seq.empty[(String, String)].toDF("last_name", "prisoner_no")
    val ln = graft.normalize.Names.normalizeLastName(empty, "last_name")
    assert(ln.count() === 0)
    assert(ln.columns.exists(_.startsWith("last_name_cleaned")))
    val pn = graft.normalize.PrisonerNumbers.normalise(empty, "prisoner_no")
    assert(pn.count() === 0)
    val nat = graft.normalize.Nationality.standardize(
      Seq.empty[String].toDF("nationality"), "nationality",
      Map("polish" -> "Poland"), Map("unclear" -> "?"))
    assert(nat.count() === 0)
  }

  test("jaro UDF is null-safe like its siblings") {
    val session = SparkSpec.spark
    import session.implicits._
    val df = Seq(("anna", null.asInstanceOf[String]), (null.asInstanceOf[String], "anna"),
      ("anna", "anna"))
      .toDF("a", "b")
      .select(graft.functions.Udfs.jaro(col("a"), col("b")).as("j"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty && got(1).isEmpty, "null input must yield null, not an NPE")
    assert(got(2).contains(1.0))
  }
}
