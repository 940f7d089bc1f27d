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
  // Regexes.PyS, not bare \s (r20): python also strips the information
  // separators U+001C-001F, which White_Space excludes — the r20 golden
  // probes ("Meier\x1c" etc.) caught the residue in every family.
  def pyStrip(c: Column): Column =
    regexp_replace(c, Regexes.pyS("(?U)^\\s+|\\s+$"), "")

  /** F1 `clean_copy` (aux_functions.py:11-37): canonicalize dash-words →
    * `-`, deleted-words → ``, unclear-words → `?`, separators → `;`,
    * then collapse/trim separators. Chains apply in reference order.
    */
  /** Gated python-parity replace (r20): a cell with no
    * [[Regexes.DivergenceCover]] char behaves identically under the
    * native-`\b` fast pattern and the exact PyB pattern (the cover is
    * case-closed, so chains that case-map in between cannot leak), and
    * the exact form costs 10-25× — so Latin/ASCII cells take the fast
    * regex and only potentially-divergent cells pay for exactness.
    */
  def pyReplace(c: Column, exact: String, fast: String, repl: String): Column =
    if (exact == fast) regexp_replace(c, exact, repl)
    else when(c.rlike(Regexes.DivergenceCover), regexp_replace(c, exact, repl))
      .otherwise(regexp_replace(c, fast, repl))

  private def cleanChain(in: Column, dash: String, semi: String): Column = {
    val replaced = Seq(
      dash -> "-",
      Regexes.DeletedWords -> "",
      Regexes.QuestionMarkWords -> "?",
      semi -> ";",
      ";+" -> ";",
      Regexes.pyS("(?U)^\\s*;\\s*|\\s*;\\s*$|^\\s+|\\s+$|[\\n\\t]*") -> "",
      "-+" -> "-")
    replaced.foldLeft(pyStrip(in)) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
  }

  def cleanCopy(c: Column): Column =
    // one gate for the whole chain: every inserted fragment is ASCII and
    // the cover is case-closed, so no intermediate can become divergent
    when(c.rlike(Regexes.DivergenceCover), cleanCopyVariant(c, exact = true))
      .otherwise(cleanCopyVariant(c, exact = false))

  /** Ungated single-variant form, for callers that hold their own
    * divergence gate (the name chains gate ONCE per row and build both
    * variants linearly — per-step gating re-references the accumulated
    * expression tree per step and blows the plan up exponentially).
    */
  private[normalize] def cleanCopyVariant(c: Column, exact: Boolean): Column =
    if (exact) cleanChain(c, Regexes.DashWords, Regexes.SemicolonWords)
    else cleanChain(c, Regexes.DashWordsFast, Regexes.SemicolonWordsFast)

  /** `clean_copy_2` (aux_functions.py:40-65): identical chain except the
    * final step also maps fully-empty values to the `-` sentinel.
    */
  private def cleanChain2(in: Column, dash: String, semi: String): Column = {
    val replaced = Seq(
      dash -> "-",
      Regexes.DeletedWords -> "",
      Regexes.QuestionMarkWords -> "?",
      semi -> ";",
      ";+" -> ";",
      Regexes.pyS("(?U)^\\s*;\\s*|\\s*;\\s*$|^\\s+|\\s+$|[\\n\\t]*") -> "",
      "-+|^$" -> "-")
    replaced.foldLeft(pyStrip(in)) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
  }

  def cleanCopy2(c: Column): Column =
    when(c.rlike(Regexes.DivergenceCover),
      cleanChain2(c, Regexes.DashWords, Regexes.SemicolonWords))
      .otherwise(cleanChain2(c, Regexes.DashWordsFast, Regexes.SemicolonWordsFast))

  /** F2 `create_qa_col` (aux_functions.py:70-91): flag when the QA regex
    * hits unless the no-entry regex does.
    */
  def createQaCol(c: Column, qaRegex: String, noEntryRegex: String): Column =
    coalesce(c.rlike(qaRegex), lit(false)) && !coalesce(c.rlike(noEntryRegex), lit(false))

  /** F5 `keyword_removal` (aux_functions.py:139-142) — lowercases with
    * python semantics (value kept; see [[PyText.pyLower]]).
    */
  def keywordRemoval(c: Column, regex: String): Column =
    regexp_replace(PyText.pyLowerUdf(c), regex, "")

  /** F13 `remove_name_spacing` (aux_functions.py:195-203): collapse
    * "B l o c k e d" letter-spaced words.
    */
  def removeNameSpacing(c: Column): Column =
    removeNameSpacingWith(c, Regexes.LetterSpacing)
  def removeNameSpacingWith(c: Column, letterSpacing: String): Column =
    regexp_replace(c, letterSpacing, "$1")

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
  /** Python `str.title()`: runs are keyed on the Unicode CASED property
    * (not `isLetter` — an uncased Hebrew/CJK/ʻokina letter resets the
    * run), run starts take the FULL titlecase mapping (one-to-many:
    * "ß" -> "Ss", "ﬁne" -> "Fine"), run continuations the full lowercase
    * mapping with the final-sigma context rule. Exact algorithm and the
    * JVM-vs-CPython exception tables live in [[PyCase]] (r20, closing
    * the r19 ADVICE item). Differs from Spark `initcap`, which only
    * breaks on whitespace and is wrong for "bob1 bob2" / "weiss-meyer".
    */
  def pyTitle(s: String): String = PyCase.title(s)

  /** Python `str.lower()`, exact: full lowercase mapping with the
    * capital-sigma context rule. NOT `String.toLowerCase(ROOT)` (JDK 17
    * = Unicode 13): CPython on this box is Unicode 14, so the JDK misses
    * the Vithkuqi/Latin-Extended additions (e.g. U+10570 lowers to
    * U+10597 in python, stays put in the JDK) and the two sigma context
    * scans use different Case_Ignorable sets. All-codepoint-swept vs
    * CPython in four contexts (graft.CaseSweep, r20: 4,448,256 probes,
    * 0 mismatches).
    */
  def pyLower(s: String): String = PyCase.lower(s)

  /** Python `str.upper()`, exact: full uppercase mapping (one-to-many:
    * "ß" -> "SS", "ﬁ" -> "FI"), no context rules. Swept like
    * [[pyLower]] (2,224,128 probes, 0 mismatches).
    */
  def pyUpper(s: String): String = PyCase.upper(s)

  /** Python `str.isspace` for a single UTF-16 unit: Java's
    * `Character.isWhitespace` PLUS the no-break spaces (U+00A0, U+2007,
    * U+202F) and NEL (U+0085) it excludes. Verified identical to the
    * CPython set by an all-codepoint sweep (r20): both sides resolve to
    * exactly {09-0D, 1C-1F, 20, 85, A0, 1680, 2000-200A, 2028, 2029,
    * 202F, 205F, 3000}.
    */
  def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == 0x85.toChar || c == 0xA0.toChar ||
      c == 0x2007.toChar || c == 0x202F.toChar

  /** Python `str.strip()` for plain JVM strings (the Column twin is
    * [[Clean.pyStrip]]). NOT `String.trim`: trim strips every control
    * char <= U+0020 (python keeps \x00-\x08 and \x0e-\x1b) and misses
    * NBSP/NEL, so a `.strip()` replay through trim diverges both ways.
    */
  def pyStripStr(s: String): String = {
    if (s == null) return null
    var a = 0
    var b = s.length
    while (a < b && pyIsSpace(s.charAt(a))) a += 1
    while (b > a && pyIsSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
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
  val pyLowerUdf = org.apache.spark.sql.functions.udf(pyLower _)
  val sortListUdf = org.apache.spark.sql.functions.udf(sortListInColumn _)
}
