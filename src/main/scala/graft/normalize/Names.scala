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

    // ONE divergence gate per row, on the RAW input (the cover is
    // case-closed and every chain insertion is ASCII, so no step can
    // turn a fast-path row divergent — Regexes.DivergenceCover scaladoc).
    // Both regex-set variants are built as LINEAR chains and branched at
    // a single point: gating per step would re-reference the accumulated
    // expression tree 3× per step (gate + two branches) and grow the
    // plan exponentially — measured as a 7× q21 regression before this
    // shape, within noise after it.
    val mayDiv = coalesce(col(lastName).rlike(Regexes.DivergenceCover), lit(false))

    def chain(exact: Boolean): (Column, Column, Column) = {
      val (acad, keyw, noble, birth, birthClean, nameSemi, letter) =
        if (exact)
          (Regexes.AcademicTitle, Regexes.KeyWords, Regexes.NobleName,
            Regexes.BirthName, Regexes.BirthNameClean,
            Regexes.NameSemicolonTransformation, Regexes.LetterSpacing)
        else
          (Regexes.AcademicTitleFast, Regexes.KeyWordsFast, Regexes.NobleNameFast,
            Regexes.BirthNameFast, Regexes.BirthNameCleanFast,
            Regexes.NameSemicolonTransformationFast, Regexes.LetterSpacingFast)

      var c = cleanCopyVariant(col(lastName), exact)
      // value kept (column_processing.py:60) — python lower semantics;
      // off the case-closed cover Spark's native lower() IS python's
      // lower (no İ/Σ/U14 present), so only the exact variant pays the
      // UDF (the fast path stays whole-stage-codegen'd end to end)
      c = if (exact) PyText.pyLowerUdf(c) else lower(c)
      c = removeNameSpacingWith(c, letter)
      c = regexp_replace(c, acad, "")
      c = regexp_replace(if (exact) PyText.pyLowerUdf(c) else lower(c), keyw, "")

      // noble prefix: extracted for QA, left in place (F6)
      val hasNoble = c.rlike(noble)

      // birth-name tail: extract then strip from the name (F7)
      val birthRaw = when(c.rlike(birth),
        regexp_replace(regexp_extract(c, birth, 1), birthClean, ""))
        .otherwise(lit(""))
      val birthName = pyTitleUdf(regexp_replace(birthRaw, birth, ""))
      if (!birthNameInput) c = regexp_replace(c, birth, "")

      c = regexp_replace(c, Regexes.StripSemicolon, "")
      c = regexp_replace(pyStrip(c), ";", " ")
      c = regexp_replace(pyStrip(c), nameSemi, ";")
      c = regexp_replace(pyStrip(c), ";{2,}", ";")
      (c, birthName, hasNoble)
    }
    val (cExact, birthExact, nobleExact) = chain(exact = true)
    val (cFast, birthFast, nobleFast) = chain(exact = false)
    val c = when(mayDiv, cExact).otherwise(cFast)
    val birthName = when(mayDiv, birthExact).otherwise(birthFast)
    val hasNoble = when(mayDiv, nobleExact).otherwise(nobleFast)
    val nobleQa = if (flagNoblePrefix) hasNoble else lit(false)

    var qa = createQaCol(c, Regexes.Qa, Regexes.QaNoEntry)
    if (!birthNameInput) qa = qa || birthName.rlike(Regexes.Qa)
    qa = qa || nobleQa

    val parts = split(pyTitleUdf(c), ";", 5)
    // localCheckpoint: the arity aggregation below and the final select
    // are two consumers of the full regex chain — materialize it once.
    // The three derived values are packed into ONE struct column first:
    // as separate withColumns each would embed its own copy of the dual
    // exact/fast chain (~30 multi-KB regex instances serialized per
    // task instead of ~10)
    val df1 = input
      .withColumn("__nm", struct(parts.as("parts"), birthName.as("birth"), qa.as("qa0")))
      .trackedCheckpoint()
      .withColumn("__parts", col("__nm.parts"))
      .withColumn("__birth", col("__nm.birth"))
      .withColumn("__qa0", col("__nm.qa0"))
      .drop("__nm")
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

    // single-branch-point dual chain, gated on the raw input
    // (see normalizeLastName for the why)
    val mayDiv = coalesce(col(firstName).rlike(Regexes.DivergenceCover), lit(false))

    def chain(exact: Boolean): (Column, Column) = {
      val (acad, keyw, noble) =
        if (exact) (Regexes.AcademicTitle, Regexes.KeyWords, Regexes.NobleName)
        else (Regexes.AcademicTitleFast, Regexes.KeyWordsFast, Regexes.NobleNameFast)
      var c = cleanCopyVariant(col(firstName), exact)
      c = pyTitleUdf(c)
      c = regexp_replace(c, acad, "")
      c = regexp_replace(if (exact) PyText.pyLowerUdf(c) else lower(c), keyw, "")
      val hasNoble = c.rlike(noble)
      // noble prefix removed here; value kept (column_processing.py:264);
      // native lower == python lower off the cover (see normalizeLastName)
      c = regexp_replace(if (exact) PyText.pyLowerUdf(c) else lower(c), noble, "")
      c = regexp_replace(pyStrip(c), Regexes.SemicolonTransformation, ";")
      (c, hasNoble)
    }
    val (cExact, nobleExact) = chain(exact = true)
    val (cFast, nobleFast) = chain(exact = false)
    val c = when(mayDiv, cExact).otherwise(cFast)
    val hasNoble = when(mayDiv, nobleExact).otherwise(nobleFast)

    val qa = createQaCol(c, Regexes.Qa, Regexes.QaNoEntry) || hasNoble

    val parts = split(pyTitleUdf(c), ";", 5)
    // same two-consumer materialization as the last-name family
    // struct-packed for the same reason as normalizeLastName
    val df1 = input
      .withColumn("__nm", struct(parts.as("parts"), qa.as("qa0")))
      .trackedCheckpoint()
      .withColumn("__parts", col("__nm.parts"))
      .withColumn("__qa0", col("__nm.qa0"))
      .drop("__nm")
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
