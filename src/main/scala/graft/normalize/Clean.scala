package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-cleaning primitives (SURVEY F1/F2/F5/F13/F15; reference
  * `src/aroa_etl/attribute_processing/aux_functions.py`).
  *
  * Everything here is a `Column => Column` built from codegen'd built-ins
  * (`regexp_replace`/`rlike`) — no UDFs in these hot paths; the few
  * operations Spark's expression language cannot express exactly
  * (python `str.title`, stable numeric list sort) live in [[PyText]].
  */
object Clean {
  /** Python `str.strip()` (all whitespace, not just spaces). */
  // (?U): python's \s (and \b/\w) are unicode-aware on str — NBSP and
  // the other Zs spaces are whitespace to the reference. Java matches
  // only with UNICODE_CHARACTER_CLASS (r19: the NBSP golden probes
  // caught the ASCII-\s divergence — " Edged " kept its edges).
  def pyStrip(c: Column): Column = regexp_replace(c, "(?U)^\\s+|\\s+$", "")

  /** F1 `clean_copy` (aux_functions.py:11-37): canonicalize dash-words →
    * `-`, deleted-words → ``, unclear-words → `?`, separators → `;`,
    * then collapse/trim separators. Chains apply in reference order.
    */
  def cleanCopy(c: Column): Column = {
    val replaced = Seq(
      Regexes.DashWords -> "-",
      Regexes.DeletedWords -> "",
      Regexes.QuestionMarkWords -> "?",
      Regexes.SemicolonWords -> ";",
      ";+" -> ";",
      "(?U)^\\s*;\\s*|\\s*;\\s*$|^\\s+|\\s+$|[\\n\\t]*" -> "",
      "-+" -> "-")
    replaced.foldLeft(pyStrip(c)) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
  }

  /** `clean_copy_2` (aux_functions.py:40-65): identical chain except the
    * final step also maps fully-empty values to the `-` sentinel.
    */
  def cleanCopy2(c: Column): Column = {
    val replaced = Seq(
      Regexes.DashWords -> "-",
      Regexes.DeletedWords -> "",
      Regexes.QuestionMarkWords -> "?",
      Regexes.SemicolonWords -> ";",
      ";+" -> ";",
      "(?U)^\\s*;\\s*|\\s*;\\s*$|^\\s+|\\s+$|[\\n\\t]*" -> "",
      "-+|^$" -> "-")
    replaced.foldLeft(pyStrip(c)) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
  }

  /** F2 `create_qa_col` (aux_functions.py:70-91): flag when the QA regex
    * hits unless the no-entry regex does.
    */
  def createQaCol(c: Column, qaRegex: String, noEntryRegex: String): Column =
    coalesce(c.rlike(qaRegex), lit(false)) && !coalesce(c.rlike(noEntryRegex), lit(false))

  /** F5 `keyword_removal` (aux_functions.py:139-142) — lowercases. */
  def keywordRemoval(c: Column, regex: String): Column =
    regexp_replace(lower(c), regex, "")

  /** F13 `remove_name_spacing` (aux_functions.py:195-203): collapse
    * "B l o c k e d" letter-spaced words.
    */
  def removeNameSpacing(c: Column): Column =
    regexp_replace(c, Regexes.LetterSpacing, "$1")

  /** `date_validity_check` (aux_functions.py:108-134): flag pure-digit
    * values outside [lower, upper] (0 exempt); any non-digit content in a
    * non-empty value is always flagged.
    */
  def dateValidityCheck(c: Column, upper: Int, lower: Int): Column = {
    val pureDigits = c.rlike("^[0-9]+$")
    val stripped = regexp_replace(c, "^0+", "")
    // Guarded cast: ANSI mode would throw on >19-digit strings, so values
    // longer than 9 digits are flagged directly (always above `upper`).
    // intrinsically ANSI-safe cast (CSE can hoist it out of the when)
    val asLong = when(stripped.rlike("^[0-9]{1,9}$"), stripped).cast("long")
    when(!pureDigits, length(c) > 0)
      .when(stripped === "", lit(false)) // all zeros -> int 0 -> exempt
      .when(length(stripped) > 9, lit(true))
      .otherwise(asLong > upper || asLong < lower)
  }
}

/** Pure-Scala kernels for pandas string semantics Spark lacks. */
object PyText {
  /** Python `str.title()`: a letter starting a run (preceded by any
    * non-letter, including digits) is uppercased, the rest lowered.
    * Differs from Spark `initcap`, which only breaks on whitespace and
    * is wrong for "bob1 bob2" / "weiss-meyer" shapes.
    */
  def pyTitle(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var prevIsLetter = false
    var i = 0
    // CODEPOINT walk, not chars (r19): a per-UTF-16-unit walk sees an
    // astral letter as two non-letter surrogates, resets the run, and
    // uppercases the NEXT letter ("na𝖒e" -> "Na𝖒E" where python's
    // title() gives "Na𝖒e"). Run starts take Character.toTitleCase —
    // python's title() uses the TITLECASE mapping, which differs from
    // uppercase exactly on the digraphs (ǆ -> ǅ, not Ǆ); goldens
    // adjudicate both choices against the reference.
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        sb.appendCodePoint(if (prevIsLetter) Character.toLowerCase(cp) else Character.toTitleCase(cp))
        prevIsLetter = true
      } else {
        sb.appendCodePoint(cp)
        prevIsLetter = false
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  // hoisted: sortListInColumn runs per ROW and String.replaceAll
  // re-compiles its pattern per call (per PART here)
  private val nonDigits = java.util.regex.Pattern.compile("[^0-9]+")

  /** F15 `sort_list_in_column` (aux_functions.py:147-190): sort a
    * `;`-joined list by the digit-only projection of each part —
    * lexicographically (the reference sorts the digit *strings*), stable.
    */
  def sortListInColumn(s: String): String = {
    if (s == null) return null
    val parts = s.split(";", -1)
    val keys = parts.map(p => nonDigits.matcher(p).replaceAll(""))
    parts.indices.sortBy(i => keys(i)).map(parts).mkString(";")
  }

  val pyTitleUdf = org.apache.spark.sql.functions.udf(pyTitle _)
  val sortListUdf = org.apache.spark.sql.functions.udf(sortListInColumn _)
}
