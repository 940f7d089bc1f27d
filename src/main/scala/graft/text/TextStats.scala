package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language identification, document fingerprinting.
  *
  * Everything except language-ID and the rolling hash is built from
  * codegen'd column expressions (`regexp_extract_all`, `split`, higher-
  * order array functions) so the hot path stays inside whole-stage
  * codegen at 100 TB. The two scalar kernels are allocation-light UDFs.
  */
object TextStats {

  /** Whitespace token count. Tokenless text (empty or all-whitespace)
    * counts 0 tokens: split("") yields [""], whose size-1 artifact
    * would hand an empty document one phantom token (and, downstream, a
    * perfect distinct-token ratio in the quality score). rlike(\S), not
    * length(trim(..)) === 0 — Spark trim strips only SPACES, so a
    * tab-only document passed the old guard and counted TWO phantom
    * tokens (the leading and trailing empty splits). Whitespace is
    * stripped from BOTH edges pre-split: Java regex split emits an
    * empty token at either edge ("\thello" splits as ["","hello"] = 2
    * tokens; "a\t" as ["a",""]). The q28/q29 oracle SQL mirrors both
    * rules (r19; the wordShingles precedent — r18 stripped only the
    * trailing side).
    */
  def tokenCount(text: Column): Column =
    when(!text.rlike("\\S"), 0)
      .otherwise(size(split(regexp_replace(text, "^\\s+|\\s+$", ""), "\\s+")))

  /** BPE-ish token count: a GPT-2-style pre-tokenizer regex (contraction
    * suffixes, letter runs, digit runs, punctuation runs, whitespace
    * runs each become one pre-token).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"), lit(0)))

  /** Ratio helpers (0.0–1.0 of characters). */
  def charRatio(text: Column, charClassRegex: String): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, s"[^$charClassRegex]", "")).cast("double") / length(text))

  def punctRatio(text: Column): Column = charRatio(text, "\\p{Punct}")
  def digitRatio(text: Column): Column = charRatio(text, "0-9")
  def alphaRatio(text: Column): Column = charRatio(text, "\\p{L}")
  def upperRatio(text: Column): Column = charRatio(text, "\\p{Lu}")

  private val EnStopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "are", "was", "be", "that", "it", "for", "on", "with", "as")

  /** Fraction of whitespace tokens that are (English) stopwords. The
    * guard is on tokenless TEXT, not an empty token array — split("")
    * is [""], so size(toks) === 0 never fires (the pre-fix dead
    * guard). Same tokenization rules as [[tokenCount]]: rlike(\S)
    * guard, both-edge whitespace stripped pre-split.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val toks = split(regexp_replace(lower(text), "^\\s+|\\s+$", ""), "\\s+")
    when(!text.rlike("\\S"), 0.0).otherwise(
      size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks))
  }

  /** Distinct-token fraction — low values signal boilerplate repetition.
    * Tokenless text reads 0.0 (same guard as stopwordRatio): the [""]
    * split artifact would otherwise score an empty document a PERFECT
    * 1.0 repetition ratio — and a tab-only document, whose ["",""]
    * split survives a trim-based guard, a 0.5.
    */
  def distinctTokenRatio(text: Column): Column = {
    val toks = split(regexp_replace(lower(text), "^\\s+|\\s+$", ""), "\\s+")
    when(!text.rlike("\\S"), 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Composite quality score 0–1 (heuristic: enough length, mostly
    * letters, some stopwords, not too repetitive, sane punctuation).
    * Weights are engine defaults, overridable by recomposition.
    */
  def qualityScore(text: Column): Column = {
    val lengthOk = least(length(text).cast("double") / 200.0, lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * 4.0, lit(1.0))
    val distinct = distinctTokenRatio(text)
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    (lengthOk * 0.2 + alpha * 0.3 + stop * 0.2 + distinct * 0.15 + punctPenalty * 0.15)
  }

  // --- language identification (scalar heuristic) -------------------------

  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "are"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für", "von", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que", "des", "du"),
    "es" -> Set("el", "los", "las", "es", "no", "por", "para", "una", "con", "del", "se", "como"),
    "it" -> Set("il", "di", "che", "non", "per", "una", "sono", "con", "del", "gli", "questo"))

  /** N-gram/stopword language heuristic: CJK/kana/Hangul/Cyrillic
    * scripts by codepoint block — any significant kana marks Japanese
    * (Japanese mixes kana with kanji; Chinese text has no kana), Hangul
    * marks Korean, remaining ideograph-heavy text marks Chinese — then
    * Latin languages by stopword-profile hits (most hits wins, "und"
    * beats "unknown" only with ≥2 evidence tokens).
    *
    * Block coverage beyond the primary blocks: halfwidth katakana
    * (U+FF66–U+FF9D, common in OCR'd/legacy Japanese) counts as kana;
    * compatibility jamo (U+3130–U+318F, decomposed/legacy Korean)
    * counts as Hangul; CJK Extension A (U+3400–U+4DBF) counts as
    * ideographs. All three are BMP blocks, so the per-char loop sees
    * them whole (no surrogate pairs).
    */
  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "unknown"
    var ideo = 0; var kana = 0; var hangul = 0; var cyrillic = 0; var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A) ideo += 1
        else if (block == Character.UnicodeBlock.HIRAGANA ||
          block == Character.UnicodeBlock.KATAKANA ||
          // the halfwidth katakana RANGE only: the containing block
          // (HALFWIDTH_AND_FULLWIDTH_FORMS) also holds fullwidth Latin
          // letters (Ａ–Ｚ), which must stay Latin
          (c >= 'ｦ' && c <= 'ﾝ')) kana += 1
        else if (block == Character.UnicodeBlock.HANGUL_SYLLABLES ||
          block == Character.UnicodeBlock.HANGUL_JAMO ||
          block == Character.UnicodeBlock.HANGUL_COMPATIBILITY_JAMO) hangul += 1
        else if (block == Character.UnicodeBlock.CYRILLIC) cyrillic += 1
      }
      i += 1
    }
    if (letters == 0) return "unknown"
    if (kana.toDouble / letters > 0.1) return "ja"
    if (hangul.toDouble / letters > 0.3) return "ko"
    if (ideo.toDouble / letters > 0.3) return "zh"
    if (cyrillic.toDouble / letters > 0.3) return "ru"
    val tokens = text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}]+").filter(_.nonEmpty)
    if (tokens.isEmpty) return "unknown"
    val hits = profiles.view.mapValues(p => tokens.count(p.contains)).toMap
    val (best, n) = hits.maxBy { case (lang, c) => (c, lang) }
    if (n >= 2) best else "unknown"
  }

  val detectLanguageUdf = udf(detectLanguage _)

  // --- document fingerprinting --------------------------------------------

  /** Rolling polynomial (Rabin–Karp) fingerprint of the normalized text:
    * case-folded, whitespace-collapsed. Stable across runs and partitions
    * (pure arithmetic, no JVM hash seeding).
    */
  // hoisted: both fingerprint kernels run per ROW and String.replaceAll
  // re-compiles its pattern per call
  private val wsRun = java.util.regex.Pattern.compile("\\s+")
  private val nonAlnum = java.util.regex.Pattern.compile("[^a-z0-9]")

  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    val norm = wsRun.matcher(text.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ").trim
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < norm.length) {
      h = 31 * h + norm.charAt(i)
      i += 1
    }
    h
  }

  val fingerprintUdf = udf(fingerprint _)

  /** Winnowing-style robust fingerprint set: minimum rolling hash per
    * window of k-gram hashes — stable under small edits. Returns the
    * selected hashes (document sketch).
    */
  def winnowingSketch(text: String, k: Int = 5, window: Int = 4): Seq[Long] = {
    if (text == null) return Nil
    val norm = nonAlnum.matcher(text.toLowerCase(java.util.Locale.ROOT)).replaceAll("")
    if (norm.length < k) return Seq(fingerprint(norm))
    val grams = (0 to norm.length - k).map { i =>
      var h = 1125899906842597L
      var j = i
      while (j < i + k) { h = 31 * h + norm.charAt(j); j += 1 }
      h
    }
    grams.sliding(window).map(_.min).toSeq.distinct
  }

  val winnowingSketchUdf = udf((t: String) => winnowingSketch(t))
}
