package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.SessionHygiene.TrackedCheckpoint

/** Last/first-name normalization (SURVEY F3–F14; reference
  * `src/aroa_etl/attribute_processing/column_processing.py:48-342`).
  *
  * Each normalizer appends its derived columns (`<name>_cleaned_i`,
  * `<name>_qa`, `<name>_data_source`, …) to the input frame — the
  * reference's per-family derived-frame + index-concat becomes plain
  * same-row column expressions (no join, no shuffle). The only extra job
  * is one `max(size(split))` aggregation per family because the number of
  * numbered output columns is data-dependent (two-pass, like unpack).
  */
object Names {
  import Clean._
  import PyText._

  private[normalize] def maxParts(df: DataFrame, arr: Column): Int = {
    // max() over an EMPTY (or all-null) frame aggregates to SQL NULL;
    // getInt would NPE — an empty input normalizes to an empty output
    // with the k=1 column family, not a crash
    val row = df.agg(max(size(arr))).head()
    if (row.isNullAt(0)) 1 else math.max(row.getInt(0), 1)
  }

  /** `normalize_last_name` (column_processing.py:48-227). Appends:
    * `{out}_cleaned_0..k`, `{out}_birth_name_extracted`, `{out}_qa`,
    * `{out}_data_source` (k = batch max split parts − 1, ≤ 4).
    */
  def normalizeLastName(
      input: DataFrame,
      lastName: String,
      dataSource: String = "crowd_sourcing",
      outName: String = "last_name",
      birthNameInput: Boolean = false,
      alias: Boolean = false,
      alternativeSpelling: Boolean = false,
      flagNoblePrefix: Boolean = true): DataFrame = {
    // reference naming modes (column_processing.py:180-222): birth-name
    // input renames the family, alias suffixes it, alternative-spelling
    // prefixes cleaned/qa (1-based) but NOT data_source (quirk kept)
    val colName =
      if (birthNameInput) "birth_name"
      else if (alias) s"${outName}_alias"
      else outName
    def cleanedName(i: Int): String =
      if (alternativeSpelling) s"alternative_spellings_of_${colName}_cleaned_${i + 1}"
      else s"${colName}_cleaned_$i"
    val qaName =
      if (alternativeSpelling) s"alternative_spellings_of_${colName}_qa" else s"${colName}_qa"
    val emitBirth = !birthNameInput && !alternativeSpelling

    var c = cleanCopy(col(lastName))
    c = lower(c)
    c = removeNameSpacing(c)
    c = regexp_replace(c, Regexes.AcademicTitle, "")
    c = keywordRemoval(c, Regexes.KeyWords)

    // noble prefix: extracted for QA, left in place (F6)
    val hasNoble = c.rlike(Regexes.NobleName)
    val nobleQa = if (flagNoblePrefix) hasNoble else lit(false)

    // birth-name tail: extract then strip from the name (F7)
    val birthRaw = when(c.rlike(Regexes.BirthName),
      regexp_replace(regexp_extract(c, Regexes.BirthName, 1), Regexes.BirthNameClean, ""))
      .otherwise(lit(""))
    val birthName = pyTitleUdf(regexp_replace(birthRaw, Regexes.BirthName, ""))
    if (!birthNameInput) c = regexp_replace(c, Regexes.BirthName, "")

    c = regexp_replace(c, Regexes.StripSemicolon, "")
    c = regexp_replace(pyStrip(c), ";", " ")
    c = regexp_replace(pyStrip(c), Regexes.NameSemicolonTransformation, ";")
    c = regexp_replace(pyStrip(c), ";{2,}", ";")

    var qa = createQaCol(c, Regexes.Qa, Regexes.QaNoEntry)
    if (!birthNameInput) qa = qa || birthName.rlike(Regexes.Qa)
    qa = qa || nobleQa

    val parts = split(pyTitleUdf(c), ";", 5)
    // localCheckpoint: the arity aggregation below and the final select
    // are two consumers of the full regex chain — materialize it once
    val df1 = input
      .withColumn("__parts", parts)
      .withColumn("__birth", birthName)
      .withColumn("__qa0", qa)
      .trackedCheckpoint()
    val k = maxParts(df1, col("__parts"))

    // length-cap QA on all split columns but the last (F10), then digit
    // strip (F11) and trim
    val splitCols = (0 until k).map(i => get(col("__parts"), lit(i)))
    val lenQa = splitCols.dropRight(1)
      .map(sc => coalesce(length(sc) > 49, lit(false)))
      .foldLeft(col("__qa0"))(_ || _)

    var out = df1
    val cleanedNames = (0 until k).map(cleanedName)
    for ((name, i) <- cleanedNames.zipWithIndex)
      out = out.withColumn(name,
        pyStrip(regexp_replace(get(col("__parts"), lit(i)), "[0-9]", "")))
    if (emitBirth)
      out = out.withColumn(s"${colName}_birth_name_extracted", pyStrip(col("__birth")))
    out = out
      .withColumn(qaName, lenQa)
      .withColumn(s"${colName}_data_source", lit(dataSource))
      .drop("__parts", "__birth", "__qa0")

    // F14: female last-name endings — positional cascade over the columns
    // at positions 1..4 of the derived frame (split cols then the
    // extracted birth name, exactly the reference's iloc[:, 1:5] window)
    val window = (cleanedNames ++
      (if (emitBirth) Seq(s"${colName}_birth_name_extracted") else Nil))
    val positional = window.drop(1).take(4)
    var prev: Column = col(window.head)
    for (name <- positional) {
      val ext = when(col(name).isin("Ova", "Ene", "Aite", "Ite", "Yte"),
        concat(prev, lower(col(name)))).otherwise(col(name))
      out = out.withColumn(name, ext)
      prev = col(name)
    }
    out
  }

  /** `normalize_first_name` (column_processing.py:232-342). Appends
    * `{out}_cleaned_0..k`, `{out}_qa`, `{out}_data_source`.
    */
  def normalizeFirstName(
      input: DataFrame,
      firstName: String,
      dataSource: String = "crowd_sourcing",
      outName: String = "first_name",
      alias: Boolean = false,
      alternativeSpelling: Boolean = false): DataFrame = {
    val colName = if (alias) s"${outName}_alias" else outName
    def cleanedName(i: Int): String =
      if (alternativeSpelling) s"alternative_spellings_of_${colName}_cleaned_${i + 1}"
      else s"${colName}_cleaned_$i"
    val qaName =
      if (alternativeSpelling) s"alternative_spellings_of_${colName}_qa" else s"${colName}_qa"

    var c = cleanCopy(col(firstName))
    c = pyTitleUdf(c)
    c = regexp_replace(c, Regexes.AcademicTitle, "")
    c = keywordRemoval(c, Regexes.KeyWords)

    val hasNoble = c.rlike(Regexes.NobleName)
    c = regexp_replace(lower(c), Regexes.NobleName, "") // noble prefix removed here
    c = regexp_replace(pyStrip(c), Regexes.SemicolonTransformation, ";")

    val qa = createQaCol(c, Regexes.Qa, Regexes.QaNoEntry) || hasNoble

    val parts = split(pyTitleUdf(c), ";", 5)
    // same two-consumer materialization as the last-name family
    val df1 = input.withColumn("__parts", parts).withColumn("__qa0", qa)
      .trackedCheckpoint()
    val k = maxParts(df1, col("__parts"))

    val splitCols = (0 until k).map(i => get(col("__parts"), lit(i)))
    val lenQa = splitCols.dropRight(1)
      .map(sc => coalesce(length(sc) > 49, lit(false)))
      .foldLeft(col("__qa0"))(_ || _)

    var out = df1
    for (i <- 0 until k) {
      val trimmed = pyStrip(get(col("__parts"), lit(i)))
      // single-character first name gets a dot: "A" -> "A." (F12)
      out = out.withColumn(cleanedName(i),
        when(length(trimmed) === 1, concat(trimmed, lit("."))).otherwise(trimmed))
    }
    out
      .withColumn(qaName, lenQa)
      .withColumn(s"${colName}_data_source", lit(dataSource))
      .drop("__parts", "__qa0")
  }
}
