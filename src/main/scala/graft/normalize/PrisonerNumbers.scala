package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.SessionHygiene.TrackedCheckpoint

/** Prisoner-number normalization (SURVEY F16; reference
  * `src/aroa_etl/attribute_processing/column_processing.py:347-484`).
  *
  * Chain: clean → strip alpha words → fix spacing around the A/B/R/Z
  * camp markers → `;`-separate → numeric sort within the list → split to
  * ≤5 `prisoner_number_trim_i` columns → de-dot `12.345` → extract the
  * marker char into a `_additional_information` sibling → QA on
  * anything non-numeric left.
  */
object PrisonerNumbers {
  import Clean._
  import PyText._

  private val CharRegexSrc = "(\\b[aAbBrRzZ](?=[^a-zA-Z])+)"
  private val CharRegex = Regexes.pyS(CharRegexSrc)
  private val CharRegexFast = Regexes.pySFast(CharRegexSrc)
  private val DeDotSrc =
    "((?<=\\b\\d{1})|(?<=[^\\d]\\d{1})|(?<=\\b\\d{2})|(?<=[^\\d]\\d{2})|(?<=\\b\\d{3})|(?<=[^\\d]\\d{3}))[.](?=\\d{3})"
  private val DeDot = Regexes.pyS(DeDotSrc)
  private val DeDotFast = Regexes.pySFast(DeDotSrc)

  def normalise(
      input: DataFrame,
      prisonerNo: String,
      dataSource: String = "crowd_sourcing",
      outName: String = "prisoner_number"): DataFrame = {

    var c = cleanCopy(col(prisonerNo))
    val qaBase = createQaCol(c, Regexes.QaPrisonerNo, Regexes.QaPrisonerNoNoEntry)

    // shared divergence gate (see Names): raw input, case-closed cover
    val mayDiv = coalesce(col(prisonerNo).rlike(Regexes.DivergenceCover), lit(false))
    def gated(exact: Column => Column, fast: Column => Column)(in: Column): Column =
      when(mayDiv, exact(in)).otherwise(fast(in))

    c = gated(
      regexp_replace(_, Regexes.pyS("\\b[a-zA-z]{2,}\\b"), ""),
      regexp_replace(_, Regexes.pySFast("\\b[a-zA-z]{2,}\\b"), ""))(pyStrip(c))
    c = regexp_replace(c, "  ", " ")
    c = regexp_replace(c, Regexes.pyS("(?U)(?<=[^0-9a-zA-Z])\\s(?=[0-9])|(?<=[a-zA-Z])\\s(?=[^0-9a-zA-Z])"), "")
    c = regexp_replace(c, Regexes.pyS("(?U)(?<=[0-9]{2})\\s(?=[0-9]{3})"), "")
    c = regexp_replace(pyStrip(c), Regexes.PrisonerNumberCharacterSeparator, "")
    c = regexp_replace(pyStrip(c), Regexes.SemicolonTransformation, ";")
    c = sortListUdf(c)

    val parts = split(c, ";", 5)
    // same two-consumer materialization as the name chains and the
    // nationality standardizer: the arity aggregation and the output
    // select would otherwise each evaluate the full clean/regex/
    // sortListUdf chain once per row
    val df1 = input.withColumn("__pparts", parts).withColumn("__pqa", qaBase)
      .trackedCheckpoint()
    val k = Names.maxParts(df1, col("__pparts"))

    var out = df1
    var qa: Column = col("__pqa")
    for (i <- 0 until k) {
      val trimName = s"${outName}_trim_${i + 1}"
      // the gate column survives the checkpoint only via re-derivation:
      // re-test the PART itself (cheap class scan, still one rlike)
      val part = get(col("__pparts"), lit(i))
      val partDiv = coalesce(part.rlike(Regexes.DivergenceCover), lit(false))
      val deDotted = when(partDiv, regexp_replace(part, DeDot, ""))
        .otherwise(regexp_replace(part, DeDotFast, ""))
      // marker extraction: a single A/B/R/Z ahead of a non-letter
      val charRaw = when(partDiv, regexp_extract(deDotted, CharRegex, 1))
        .otherwise(regexp_extract(deDotted, CharRegexFast, 1))
      val charCol = when(coalesce(length(charRaw), lit(0)) === 1, charRaw).otherwise(lit(""))
      val cleaned = when(length(charCol) === 1,
        when(partDiv, regexp_replace(deDotted, CharRegex, ""))
          .otherwise(regexp_replace(deDotted, CharRegexFast, "")))
        .otherwise(deDotted)
      out = out
        .withColumn(trimName, coalesce(cleaned, lit("")))
        .withColumn(s"${trimName}_additional_information", charCol)
      qa = qa || createQaCol(col(trimName), "[^0-9]", "^-$|nan|None")
    }
    out
      .withColumn(s"${outName}_qa", qa)
      .withColumn(s"${outName}_data_source", lit(dataSource))
      .drop("__pparts", "__pqa")
  }
}
