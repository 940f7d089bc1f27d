package graft.consensus

import java.util.regex.Pattern
import graft.core.Sentinels
import graft.functions.Fuzz
import graft.normalize.PyText

/** Per-document consensus voting (the reference's flagship operator).
  *
  * N crowd-sourced transcriptions of one document are reduced to one value
  * per column by a configurable pipeline of cross-entry repairs (umlaut /
  * abbreviation / capitalization / syllable voting) ending in a
  * containment-majority vote. Reference: `src/aroa_etl/enc/matching.py`
  * (`Col_Matcher`, 16-351; presets 353-414).
  *
  * The logic is deliberately pure Scala over the buffered group: the
  * reference's transforms are *cross-entry* (an entry is repaired using
  * evidence from its siblings), so the group must be complete before any
  * step runs. Groups are transcriptions-per-document (≤ ~10 rows), so
  * buffering inside a Spark `mapGroups`/`Aggregator` is safe; the shuffle
  * key is the document id, which is exactly the partitioning a 1000-node
  * run needs.
  */
object ColMatcher {
  /** A step either short-circuits with a scalar result (`Left`) or passes
    * the (possibly rewritten / filtered) group on (`Right`) — mirrors the
    * reference's "if a step returns a scalar, stop" rule
    * (`enc/matching.py:342-351`).
    */
  type Step = Vector[String] => Either[Option[String], Vector[String]]

  // ---- text helpers (reference `utils.py:109-168`) -------------------------

  /** `utils.replacements` = the string_utils diacritic fold plus `=`→`-`. */
  private def replaceSpecial(s: String): String =
    graft.functions.NamePreprocess.replaceSpecialCharacters(s.replace("=", "-"))

  /** NFKD fold → ASCII (reference `Col_Matcher.__to_ascii`). */
  def toAscii(s: String): String = {
    val folded = java.text.Normalizer.normalize(replaceSpecial(s), java.text.Normalizer.Form.NFKD)
    folded.filter(_ < 128)
  }

  /** Per-character ASCII fold keeping lowercase German umlauts
    * (`Col_Matcher.__to_ascii_with_umlaut` — note capital umlauts are NOT
    * preserved, matching the reference's `[äöüß]` test).
    */
  def toAsciiWithUmlaut(s: String): String =
    s.map { c =>
      if (c == 'ä' || c == 'ö' || c == 'ü' || c == 'ß') c.toString
      else toAscii(c.toString)
    }.mkString

  /** `utils.umlaut_replacements`: ä→ae ö→oe ü→ue ß→ss (distinct from the
    * string_utils chain used for record-linkage preprocessing).
    */
  def substituteUmlaute(s: String): String =
    s.replace("ä", "ae").replace("ö", "oe").replace("ü", "ue").replace("ß", "ss")

  /** Python `[\w\.]+` — python's `\w` via the Regexes translator, NOT
    * Java's `(?U)\w` (r20: python `\w` excludes combining marks, so a
    * decomposed "Mü" is TWO python words; and includes the Unicode-14
    * letters JDK 17 predates).
    */
  private val wordRe = Pattern.compile(graft.normalize.Regexes.pyS("[\\w\\.]+"))
  private val wordReFast = Pattern.compile("[\\w\\.]+", Pattern.UNICODE_CHARACTER_CLASS)
  // the three automatic-substitution patterns are object-level: they sit
  // on the consensus hot path (once per group per column per document)
  // and recompiling them per invocation is pure waste
  private val umlautRe = Pattern.compile("[üöäß]")
  private val abbrevRe = Pattern.compile(graft.normalize.Regexes.pyS("\\w{3,}\\."))
  private val abbrevReFast = Pattern.compile("\\w{3,}\\.", Pattern.UNICODE_CHARACTER_CLASS)
  private val upperRe = Pattern.compile(graft.normalize.Regexes.pyS("[A-Z]\\w*"))
  private val upperReFast = Pattern.compile("[A-Z]\\w*", Pattern.UNICODE_CHARACTER_CLASS)

  // per-string divergence gate (Regexes.mayDiverge): Latin/ASCII strings
  // behave identically under the native and python-exact \w classes
  private def wordReFor(s: String) =
    if (graft.normalize.Regexes.mayDiverge(s)) wordRe else wordReFast
  private[consensus] def abbrevReFor(s: String) =
    if (graft.normalize.Regexes.mayDiverge(s)) abbrevRe else abbrevReFast
  private[consensus] def upperReFor(s: String) =
    if (graft.normalize.Regexes.mayDiverge(s)) upperRe else upperReFast

  private[consensus] def findWords(s: String): Vector[String] = {
    val m = wordReFor(s).matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** Vote tokens (`enc/matching.py:304`). */
  private val tokenRe = Pattern.compile("([a-zA-ZäöüßÄÜÖ]+\\.?|\\d+)", Pattern.UNICODE_CHARACTER_CLASS)

  private def voteTokens(s: String): Vector[String] = {
    val m = tokenRe.matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** Translate the reference's Python named-group regex syntax to Java's. */
  // Regexes.pyS (r20): python's \s also covers U+001C-001F, which
  // UNICODE_CHARACTER_CLASS alone (White_Space) does not
  private def pyPattern(p: String): Pattern =
    Pattern.compile(graft.normalize.Regexes.pyS(p.replace("(?P<", "(?<")),
      Pattern.UNICODE_CHARACTER_CLASS)
  private def pyRepl(r: String): String =
    r.replaceAll("\\\\g<([A-Za-z][A-Za-z0-9]*)>", "\\${$1}")

  /** Ordered substring-substitution map application
    * (`Col_Matcher.__substritude_all` — insertion order preserved).
    */
  private def substituteAll(s: String, subs: collection.SeqMap[String, String]): String =
    subs.foldLeft(s) { case (acc, (k, v)) => acc.replace(k, v) }

  // ---- C1: containment-majority vote (`__match_doc`, matching.py:294-322) --

  private[graft] def matchDoc(group: Vector[String]): Option[String] = {
    // Entries with no tokens are dropped; the winner is then looked up in
    // the ORIGINAL group by its position in the FILTERED list — a reference
    // quirk preserved deliberately (enc_doc.values[match_pos]).
    val matchStrings = group.map(voteTokens).filter(_.nonEmpty)
    val lenCount = matchStrings.groupBy(_.length).view.mapValues(_.size).toMap
    if (!lenCount.values.exists(_ > 1)) return None
    val allTokens = matchStrings.flatten
    val voting = matchStrings.zipWithIndex.map { case (aWords, posA) =>
      val minScore = aWords.map(aw => allTokens.count(bw => aw.contains(bw)).toDouble).min
      (posA, minScore)
    }
    val candidates = voting.filter { case (pos, _) => lenCount(matchStrings(pos).length) > 1 }
    // Stable ascending sort then take the last => max score, ties resolved
    // to the later entry (numpy-sorted semantics of the reference).
    val (matchPos, matchCount) = candidates.sortBy(_._2).last
    if (matchCount > 1) Some(group(matchPos)).filter(_ != "") else None
  }

  // ---- C6: automatic umlaut substitution (matching.py:236-265) -------------

  private def automaticUmlautSubstitution(group: Vector[String]): Vector[String] = {
    // findWords once per entry, not once per (entry x flagged word):
    // the inner loop below only indexes into the precomputed vectors
    val wordsPerEntry = group.map(findWords)
    val umlautWords =
      for {
        words <- wordsPerEntry
        (word, pos) <- words.zipWithIndex
        if umlautRe.matcher(word).find()
      } yield (pos, word)
    val subs = collection.mutable.LinkedHashMap.empty[String, String]
    for (entryWords <- wordsPerEntry; (pos, umlautWord) <- umlautWords) {
      if (entryWords.length > pos) {
        val candidate = entryWords(pos)
        if (candidate.length >= umlautWord.length &&
          (toAsciiWithUmlaut(PyText.pyLower(umlautWord)) == toAsciiWithUmlaut(PyText.pyLower(candidate)) ||
            toAscii(PyText.pyLower(umlautWord)) == toAscii(PyText.pyLower(candidate)) ||
            substituteUmlaute(PyText.pyLower(umlautWord)) == substituteUmlaute(PyText.pyLower(candidate))))
          subs(candidate) = umlautWord
      }
    }
    group.map(substituteAll(_, subs))
  }

  // ---- C7: automatic abbreviation completion (matching.py:206-234) ---------

  private def abbreviationCompletions(group: Vector[String]): Vector[String] = {
    val wordsPerEntry = group.map(findWords)
    val abbreviations =
      for {
        words <- wordsPerEntry
        (word, pos) <- words.zipWithIndex
        if abbrevReFor(word).matcher(word).lookingAt()
      } yield (pos, word)
    val subs = collection.mutable.LinkedHashMap.empty[String, String]
    for ((pos, abbreviation) <- abbreviations; words <- wordsPerEntry) {
      if (words.length > pos) {
        val other = words(pos)
        if (!other.contains(".") && other.length > abbreviation.length + 1 &&
          other.charAt(0) == abbreviation.charAt(0))
          subs(abbreviation) = other
      }
    }
    group.map(substituteAll(_, subs))
  }

  // ---- C8: automatic capitalization (matching.py:267-292) ------------------

  private def capitalizationSubstitution(group: Vector[String]): Vector[String] = {
    val wordsPerEntry = group.map(findWords)
    val upperWords =
      for {
        words <- wordsPerEntry
        (word, pos) <- words.zipWithIndex
        if upperReFor(word).matcher(word).lookingAt()
      } yield (pos, word)
    val subs = collection.mutable.LinkedHashMap.empty[String, String]
    for (entryWords <- wordsPerEntry; (pos, upper) <- upperWords) {
      if (entryWords.length > pos) {
        val candidate = entryWords(pos)
        if (candidate != upper && PyText.pyLower(candidate) == PyText.pyLower(upper))
          subs(candidate) = upper
      }
    }
    group.map(substituteAll(_, subs))
  }

  // ---- C9: syllable/window matcher (matching.py:92-157) --------------------

  private def syllableMatchCol(entries: Array[String], wordCol: Array[String]): Unit = {
    val n = wordCol.length
    if (n < 3) return
    // All consecutive (cyclic) word pairs must be Jaro-similar ≥ 0.8.
    var i = 0
    while (i < n) {
      val w1 = wordCol(i); val w2 = wordCol((i + 1) % n)
      if (w1 != null && w2 != null && Fuzz.jaro(w1, w2) < 0.8) return
      i += 1
    }
    val windowLen = 3
    val wordScores = new Array[Double](n)
    i = 0
    while (i < n) {
      val word = wordCol(i)
      if (word != null && word.length >= windowLen) {
        val nWin = word.length + 1 - windowLen
        val scoreName = new Array[Double](nWin)
        var ws = 0
        while (ws < nWin) {
          val window = word.substring(ws, ws + windowLen)
          var j = 0
          while (j < n) {
            if (j != i) {
              val o = wordCol(j)
              if (o != null && o.contains(window) && math.abs(o.indexOf(window) - ws) < 3)
                scoreName(ws) += 1
            }
            j += 1
          }
          ws += 1
        }
        wordScores(i) = if (scoreName.min == 0) 0.0 else scoreName.sum / nWin
      }
      i += 1
    }
    var best = 0
    i = 1
    while (i < n) { if (wordScores(i) > wordScores(best)) best = i; i += 1 }
    if (wordScores(best) != 0) {
      i = 0
      while (i < n) {
        if (wordCol(i) != null) entries(i) = entries(i).replace(wordCol(i), wordCol(best))
        i += 1
      }
    }
  }

  private def syllableMatch(group: Vector[String]): Vector[String] = {
    val entries = group.toArray
    // Word lists come from the ORIGINAL entries (computed once, like the
    // reference's upfront zip_longest); replacements accumulate in entries.
    val wordLists = group.map(findWords)
    val maxLen = if (wordLists.isEmpty) 0 else wordLists.map(_.length).max
    var pos = 0
    while (pos < maxLen) {
      val wordCol = wordLists.map(ws => if (pos < ws.length) ws(pos) else null).toArray
      syllableMatchCol(entries, wordCol)
      pos += 1
    }
    entries.toVector
  }

  // ---- C10: fuzzy medoid (matching.py:166-178) -----------------------------

  private def fuzzyMedoid(group: Vector[String]): Option[String] = {
    val nonEmpty = group.filter(Sentinels.hasValueStr)
    if (nonEmpty.isEmpty) return Some("-")
    val means = nonEmpty.map(v => nonEmpty.map(o => Fuzz.ratio(v, o)).sum / nonEmpty.size)
    var best = 0
    var i = 1
    while (i < means.length) { if (means(i) > means(best)) best = i; i += 1 }
    Some(nonEmpty(best))
  }

  /** Most frequent value; ties resolved to first appearance
    * (pandas `value_counts` order for the Date matcher's break_if).
    */
  private[consensus] def modalValue(group: Vector[String]): Option[String] = {
    if (group.isEmpty) return None
    val counts = collection.mutable.LinkedHashMap.empty[String, Int]
    group.foreach(v => counts(v) = counts.getOrElse(v, 0) + 1)
    Some(counts.maxBy(_._2)._1) // LinkedHashMap preserves first-seen order; maxBy keeps first max
  }
}

/** Builder-configured consensus pipeline for one column. Mirrors the
  * reference's `Col_Matcher` fluent API (`enc/matching.py:16-351`).
  */
final class ColMatcher extends Serializable {
  import ColMatcher._

  private var pipeline = Vector.empty[Step]

  private def addGroupStep(f: Vector[String] => Vector[String]): this.type = {
    pipeline :+= ((g: Vector[String]) => Right(f(g))); this
  }

  /** C3 (`exlude_empty`): drop empty / `Unklar` entries; fewer than two
    * informative entries left means no vote is possible → scalar `"-"`.
    */
  def excludeEmpty(): this.type = {
    val unklar = Pattern.compile("[uU]nklar|[uU]nclear")
    pipeline :+= { (g: Vector[String]) =>
      val kept = g.filter(v => !Sentinels.isEmptyValueStr(v) && !unklar.matcher(v).lookingAt())
      if (kept.size < 2) Left(Some("-")) else Right(kept)
    }
    this
  }

  /** C4 (`break_if`). */
  def breakIf(cond: Vector[String] => Boolean, exceptValue: String): this.type = {
    pipeline :+= { (g: Vector[String]) => if (cond(g)) Left(Some(exceptValue)) else Right(g) }
    this
  }

  /** C5: per-entry regex substitution (Python named-group syntax accepted). */
  def withCustomSubstitution(pattern: String, repl: String): this.type = {
    val p = pyPattern(pattern); val r = pyRepl(repl)
    addGroupStep(_.map(e => p.matcher(e).replaceAll(r)))
  }

  /** C5 variant: replace the whole field when the pattern occurs. */
  def withCustomReplace(pattern: String, repl: String): this.type = {
    val p = pyPattern(pattern)
    addGroupStep(_.map(e => if (p.matcher(e).find()) repl else e))
  }

  /** F23 preset chain (`__complete_known_abbreviations`, matching.py:68-83). */
  def withKnownAbbreviationsCompleted(): this.type = {
    val chain = Seq(
      "(?P<str>[sS]tr)a?\\." -> "\\g<str>aße",
      "(?P<str>[sS]tr)a?$" -> "\\g<str>aße",
      "\\sb\\." -> " bei",
      "\\s[kK]rs?\\.?\\s?" -> " Kreis ",
      "(?P<sep1>[^\\w])[Bb]ln\\.?(?P<sep2>[\\s\\-=])" -> "\\g<sep1>Berlin\\g<sep2>",
      "^[Bb]ln\\.?(?P<sep>[\\s\\-=])" -> "Berlin\\g<sep>",
      "(?P<sep1>[^\\w])[lL][kK]r?[\\.\\s]" -> " Landkreis ",
      "(?P<number>\\d+)(?P<letter>[a-zA-Z])" -> "\\g<number> \\g<letter>"
    ).map { case (p, r) => (pyPattern(p), pyRepl(r)) }
    addGroupStep(_.map(e => chain.foldLeft(e) { case (acc, (p, r)) => p.matcher(acc).replaceAll(r) }))
  }

  def onAscii(): this.type = addGroupStep(_.map(toAscii))
  def onAsciiWithUmlaut(): this.type = addGroupStep(_.map(toAsciiWithUmlaut))
  def withAutomaticUmlautSubstitution(): this.type = addGroupStep(automaticUmlautSubstitution)
  def withAutomaticAbbreviationCompletion(): this.type = addGroupStep(abbreviationCompletions)
  def withAutomaticCapitalizationSubstitution(): this.type = addGroupStep(capitalizationSubstitution)
  def withSyllableMatching(): this.type = addGroupStep(syllableMatch)

  /** C10: scalar fuzzy-medoid result (skips the final majority vote). */
  def withFuzzyMatching(): this.type = {
    pipeline :+= { (g: Vector[String]) => Left(fuzzyMedoid(g)) }
    this
  }

  /** Run the pipeline for one document's entries (in transcription order).
    * `None` = no consensus (the reference's NaN).
    */
  def apply(group: Vector[String]): Option[String] = {
    var g = group
    for (step <- pipeline) step(g) match {
      case Left(result) => return result
      case Right(next)  => g = next
    }
    matchDoc(g)
  }
}

/** Matcher presets (`enc/matching.py:353-414`). */
object Matchers {
  private val allDash = Pattern.compile("[\\-\\s]+$")
  private val leadingDashes = Pattern.compile("\\-+")

  /** Default / Person matcher: full repair chain then majority vote. */
  def default(): ColMatcher =
    (new ColMatcher)
      .excludeEmpty()
      .withCustomSubstitution("\\s+", " ")
      .withCustomSubstitution("\\s(?P<sym>[^a-zA-Z])\\s", "\\g<sym>")
      .withAutomaticUmlautSubstitution()
      .withAutomaticAbbreviationCompletion()
      .onAsciiWithUmlaut()
      .withAutomaticCapitalizationSubstitution()
      .withSyllableMatching()

  def person(): ColMatcher = default()

  /** Strict matcher (IDs / numbers): exclude-empty + verbatim vote. */
  def strict(): ColMatcher = (new ColMatcher).excludeEmpty()

  /** Date matcher: verbatim vote guarded by the all-dash break conditions. */
  def date(): ColMatcher =
    (new ColMatcher)
      .breakIf(g => g.count(v => allDash.matcher(v).matches()) > 1, "-")
      .breakIf(g => ColMatcher.modalValue(g).exists(v => leadingDashes.matcher(v).lookingAt()), "-")

  /** Fuzzy matcher (non-critical columns): repair chain + fuzzy medoid. */
  def fuzzy(): ColMatcher =
    (new ColMatcher)
      .withCustomSubstitution("\\s+", " ")
      .withCustomSubstitution("\\s(?P<sym>[^a-zA-Z])\\s", "\\g<sym>")
      .withAutomaticUmlautSubstitution()
      .withAutomaticAbbreviationCompletion()
      .onAsciiWithUmlaut()
      .withAutomaticCapitalizationSubstitution()
      .withFuzzyMatching()
}
