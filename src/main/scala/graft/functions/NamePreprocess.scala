package graft.functions

import graft.normalize.PyText

/** Name normalization chains for record linkage (reference:
  * `src/aroa_etl/attribute_processing/string_utils.py`).
  *
  * All functions are pure; the ordered regex chains reproduce the
  * reference's insertion-order application exactly — including its quirks
  * (e.g. `oe` → "a" in the umlaut table, `string_utils.py:30-34`), because
  * downstream similarity cutoffs were tuned against these exact outputs.
  */
object NamePreprocess {

  /** Diacritic fold, single pass (`string_utils.py:5-28`). Only the listed
    * characters are touched; unknown characters pass through.
    */
  private val asciiMap: Map[Char, String] = Map(
    "á" -> "a", "ï" -> "i", "ş" -> "s", "ó" -> "o", "ł" -> "l", "ñ" -> "n",
    "è" -> "e", "ç" -> "c", "ß" -> "ss", "ô" -> "o", "ü" -> "u",
    "æ" -> "ae", "ø" -> "o", "û" -> "u", "ã" -> "a", "ê" -> "e",
    "ë" -> "e", "ù" -> "u", "î" -> "i", "é" -> "e", "í" -> "i", "ú" -> "u",
    "ý" -> "y", "à" -> "a", "ì" -> "i", "ò" -> "o", "õ" -> "o", "ă" -> "a",
    "ā" -> "a", "ē" -> "e", "ī" -> "i", "ō" -> "o", "ū" -> "u", "ȳ" -> "y",
    "ǎ" -> "a", "ě" -> "e", "ǐ" -> "i", "ǒ" -> "o", "ǔ" -> "u", "ǜ" -> "u",
    "ǽ" -> "ae", "ð" -> "d", "œ" -> "oe", "ẽ" -> "e", "ỹ" -> "y",
    "ũ" -> "u", "ȩ" -> "e", "ȯ" -> "o", "ḧ" -> "h", "ẅ" -> "w", "ẗ" -> "t",
    "ḋ" -> "d", "ẍ" -> "x", "ẁ" -> "w", "ẃ" -> "w", "ỳ" -> "y", "ÿ" -> "y",
    "ŷ" -> "y", "ą" -> "a", "į" -> "i", "ś" -> "s", "ź" -> "z", "ć" -> "c",
    "ń" -> "n", "ę" -> "e", "ţ" -> "t", "ģ" -> "g", "ķ" -> "k", "ņ" -> "n",
    "ļ" -> "l", "ż" -> "z", "ċ" -> "c", "š" -> "s", "ž" -> "z", "ď" -> "d",
    "ľ" -> "l", "ř" -> "r", "ǧ" -> "g", "ǳ" -> "dz", "ǆ" -> "dz",
    "ǉ" -> "lj", "ǌ" -> "nj", "ǚ" -> "u", "ǘ" -> "u", "ǟ" -> "a",
    "ǡ" -> "a", "ǣ" -> "ae", "ǥ" -> "g", "ǭ" -> "o", "ǯ" -> "z",
    "ȟ" -> "h", "ȱ" -> "o", "ȹ" -> "y", "ḭ" -> "i", "ḯ" -> "i", "ḱ" -> "k"
  ).map { case (k, v) => k.charAt(0) -> v }

  def replaceSpecialCharacters(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      asciiMap.get(c) match {
        case Some(rep) => sb.append(rep)
        case None      => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  // All chain patterns are compiled ONCE here: these kernels run per ROW
  // (name-normalization UDFs, linkage blocking keys), and String.replaceAll
  // re-compiles its pattern on every call — ~20 Pattern.compile per name
  // at corpus scale (the same hoist Similarity/Fuzz/Unpack apply).
  private def compiled(chain: Seq[(String, String)]): Seq[(java.util.regex.Pattern, String)] =
    chain.map { case (p, r) => java.util.regex.Pattern.compile(p) -> r }
  private def applyChain(s: String, chain: Seq[(java.util.regex.Pattern, String)]): String =
    chain.foldLeft(s) { case (acc, (p, r)) => p.matcher(acc).replaceAll(r) }

  /** Ordered umlaut folds (`string_utils.py:30-34`) — applied sequentially,
    * so `æ` folded to "ae" above then becomes "a" here; `ue` not preceded
    * by `a` becomes "a" (reference behavior, preserved verbatim).
    */
  private val umlautChain: Seq[(java.util.regex.Pattern, String)] = compiled(Seq(
    "ä" -> "a", "ae" -> "a", "ö" -> "o", "oe" -> "a", "ü" -> "u",
    "(?<!a)ue" -> "a"))

  def replaceUmlautCharacters(s: String): String = applyChain(s, umlautChain)

  /** Phonetic bigram folds (`string_utils.py:36-44`), ordered. */
  private val bigramChain: Seq[(java.util.regex.Pattern, String)] = compiled(Seq(
    "th" -> "t", "ck" -> "k", "ph" -> "f", "w" -> "v", "y" -> "i",
    "j" -> "i", "tz" -> "z"))

  def replacePhoneticCharacters(s: String): String = applyChain(s, bigramChain)

  private val doubleChar = compiled(Seq("([a-zA-Z])\\1" -> "$1"))

  /** Collapse doubled letters, single pass (`string_utils.py:165-167`). */
  def removeDoubleCharacters(s: String): String = applyChain(s, doubleChar)

  private val lastNameEndings = compiled(Seq(
    "owa$|ova$" -> "", "sohns$" -> "sons", "sohn$" -> "son",
    "(?<=sk|ck)a$" -> "i"))

  /** Slavic/patronymic surname ending folds (`string_utils.py:169-174`). */
  def removeLangSpecificLastNameEndings(s: String): String =
    applyChain(s, lastNameEndings)

  // Regexes.pyS + (?U): the reference's \s is python's (White_Space +
  // U+001C-001F) — a NBSP-joined " geb. " tail must still be stripped
  // (r20; adjudicated by the string_utils golden fixture)
  private val maidenTails = compiled(Seq(
    graft.normalize.Regexes.pyS("(?U)\\sgeb\\.?\\s.*") -> "",
    graft.normalize.Regexes.pyS("(?U)\\sgesch\\.?\\s.*") -> ""))

  /** Strip maiden-name tail: " geb. …" / " gesch. …" (`string_utils.py:176-179`). */
  def removeMaidenName(s: String): String = applyChain(s, maidenTails)

  /** `preprocess_name` (`string_utils.py:192-198`): lower → diacritic fold
    * → umlaut chain → phonetic bigrams → dedouble.
    */
  def preprocessName(s: String): String =
    removeDoubleCharacters(
      replacePhoneticCharacters(
        replaceUmlautCharacters(
          replaceSpecialCharacters(PyText.pyLower(s)))))

  /** `preprocess_last_name` (`string_utils.py:200-205`). */
  def preprocessLastName(s: String): String =
    preprocessName(removeMaidenName(removeLangSpecificLastNameEndings(PyText.pyLower(s))))

  private val nameWord = java.util.regex.Pattern.compile("[a-zA-Zäüöß]+")

  /** `fix_name_uppercasing` (`string_utils.py:153-159`): every word
    * ([a-zA-Zäüöß]+) → first letter upper, rest lower. Replayed
    * EXACTLY, quirks included (r20, golden-adjudicated):
    *  - python's one-char `.upper()` is the FULL mapping, so a
    *    word-initial ß expands to "SS" ("ßler" → "SSler");
    *  - `finditer` spans are taken on the ORIGINAL string but spliced
    *    into the MUTATED one (`string = string[:start] + fixed +
    *    string[end:]` in a loop), so after a ß-expansion every later
    *    span is off by one — the splice must clamp like python slices.
    */
  def fixNameUppercasing(s: String): String = {
    val m = nameWord.matcher(s)
    var cur = s
    while (m.find()) {
      val w = m.group()
      val fixed = PyText.pyUpper(w.substring(0, 1)) + PyText.pyLower(w.substring(1))
      val start = math.min(m.start(), cur.length)
      val end = math.min(m.end(), cur.length)
      cur = cur.substring(0, start) + fixed + cur.substring(math.max(start, end))
    }
    cur
  }

  // --- OCR confusable repair (`string_utils.py:46-151`) -------------------

  /** Keys counted toward the >30% non-ASCII rejection test
    * (`string_utils.py:144-145` — membership in visual_non_ascii only).
    */
  private val visualNonAscii: Map[String, String] = Map(
    "р" -> "p", "п" -> "n", "Η" -> "H", "ή" -> "n", "Γ" -> "T", "ѕ" -> "s",
    "м" -> "M", "д" -> "A", "σ" -> "o", "Д" -> "A", "ш" -> "w", "с" -> "c",
    "ω" -> "w", "Θ" -> "O", "ъ" -> "b", "Π" -> "N", "ن" -> "u", "β" -> "ß",
    "х" -> "x", "ง" -> "i", "μ" -> "u", "ь" -> "b", "ц" -> "u", "в" -> "B",
    "И" -> "N", "С" -> "C", "ρ" -> "p", "л" -> "n", "ы" -> "bl",
    "З" -> "B", "г" -> "r", "В" -> "B", "ə" -> "", "Л" -> "N", "Ρ" -> "P",
    "я" -> "", "○" -> "o", "א" -> "x", "у" -> "y", "Ь" -> "b", "い" -> "w",
    "π" -> "n", "й" -> "N", "ه" -> "o", "Ы" -> "bl", "Х" -> "X",
    "1" -> "l", "н" -> "H", "У" -> "y", "ж" -> "x", "מ" -> "n", "Г" -> "T",
    "م" -> "p", "γ" -> "y", "Λ" -> "A", "。" -> ".", "ν" -> "v", "•" -> "",
    "โ" -> "l", "η" -> "n", "ת" -> "n", "Š" -> "S", "m" -> "m", "Н" -> "H",
    "ด" -> "d", "δ" -> "d", "Ψ" -> "Ps", "キ" -> "ki", "č" -> "c",
    "ı" -> "i", "ς" -> "s", "ň" -> "n", "ê" -> "e", "わ" -> "wa",
    "ę" -> "e", "ř" -> "r", "Б" -> "B", "よ" -> "yo", "ة" -> "ö",
    "ó" -> "o", "φ" -> "p", "χ" -> "x", "í" -> "i", "І" -> "I", "Σ" -> "S",
    "ち" -> "t", "Č" -> "C", "ė" -> "e", "ń" -> "n", "М" -> "M", "ψ" -> "y",
    "ί" -> "i", "ق" -> "q", "工" -> "I", "υ" -> "u", "ả" -> "a", "ź" -> "z",
    "す" -> "T", "λ" -> "l", "е" -> "e", "Ά" -> "A", "Ñ" -> "N", "É" -> "E",
    "θ" -> "O", "ť" -> "t", "Ø" -> "O", "Ј" -> "J", "а" -> "a", "ë" -> "e",
    "り" -> "n", "κ" -> "k", "ε" -> "e", "Ú" -> "U", "ě" -> "e", "د" -> "i",
    "ằ" -> "a", "Ζ" -> "Z", "Ν" -> "N", "ひ" -> "U", "П" -> "N", "ć" -> "c",
    "ũ" -> "u", "Т" -> "T", "ス" -> "J", "Э" -> "E", "ј" -> "j", "ů" -> "u",
    "о" -> "o", "О" -> "O", "ą" -> "a", "Û" -> "U", "Á" -> "A", "ξ" -> "E",
    "Ό" -> "O", "æ" -> "ae", "и" -> "n", "ч" -> "y", "ă" -> "a",
    "さ" -> "t", "お" -> "F", "ż" -> "z", "Έ" -> "E", "ł" -> "l", "Ο" -> "O",
    "ン" -> "y", "年" -> "T", "ό" -> "o", "à" -> "a", "Χ" -> "X", "்" -> "",
    "Ż" -> "Z", "Ş" -> "S", "ص" -> "u", "ה" -> "h", "Р" -> "P", "ム" -> "A",
    "ت" -> "ü", "ά" -> "a", "á" -> "a", "ま" -> "L", "ô" -> "o", "è" -> "e",
    "к" -> "k", "で" -> "T", "é" -> "e", "έ" -> "e", "Ι" -> "I", "ο" -> "o",
    "і" -> "i", "Ł" -> "L", "ú" -> "u", "α" -> "a", "Δ" -> "D", "Ε" -> "E",
    "っ" -> "s", "ア" -> "y", "т" -> "t", "ã" -> "a", "ő" -> "ö", "ι" -> "i",
    "Е" -> "E", "Ω" -> "O", "Ś" -> "S", "ñ" -> "n", "Τ" -> "T", "К" -> "K",
    "ョ" -> "z", "š" -> "s", "ý" -> "y", "Β" -> "B", "日" -> "B ",
    "ş" -> "s", "ا" -> "", "ž" -> "z", "з" -> "z", "ç" -> "c", "Κ" -> "K",
    "خ" -> "i", "下" -> "T", "Ž" -> "Z", "Μ" -> "M", "å" -> "a", "ζ" -> "z",
    "А" -> "A", "â" -> "a", "б" -> "b", "̇" -> "", "れ" -> "h", "じ" -> "i",
    "の" -> "D", "." -> ".", "τ" -> "t", "'" -> "", "Α" -> "A", "ś" -> "s",
    "ら" -> "b")

  /** digits (`string_utils.py:46-50`) + A-Za-z/umlaut identity
    * (`string_utils.py:58-77`) + symbols (`string_utils.py:78-85`).
    */
  private val visualBase: Map[String, String] = {
    val numToChar = Map(
      "0" -> "O", "1" -> "l", "2" -> "", "3" -> "B", "4" -> "A", "5" -> "",
      "6" -> "", "7" -> "T", "8" -> "B", "9" -> "")
    val letters =
      (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c.toString).toMap ++
        "ßäÄöÖüÜ".map(c => c.toString -> c.toString).toMap
    val symbols = Map(
      "-" -> "-", " " -> " ", "|" -> "", "!" -> "", "#" -> "", "$" -> "",
      "%" -> "", "&" -> "", "+" -> "", "*" -> "", "@" -> "", "?" -> "",
      ";" -> "", "," -> "", "°" -> "", "~" -> "")
    numToChar ++ letters ++ symbols
  }

  private val visualAll: Map[Char, String] =
    (visualBase ++ visualNonAscii).map { case (k, v) => k.charAt(0) -> v }

  private val nonAsciiKeys: Set[Char] = visualNonAscii.keySet.map(_.charAt(0))

  /** `fix_visual_character_decoding` (`string_utils.py:142-151`): reject the
    * whole value ("") when >30% of characters are OCR-confusable
    * non-Latin; otherwise map each known character (dropping unknowns).
    */
  def fixVisualCharacterDecoding(s: String): String = {
    if (s == null || s.isEmpty) return ""
    var suspect = 0
    var i = 0
    while (i < s.length) {
      if (nonAsciiKeys.contains(s.charAt(i))) suspect += 1
      i += 1
    }
    if (suspect.toDouble / s.length > 0.3) return ""
    val sb = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      visualAll.get(s.charAt(i)).foreach(sb.append)
      i += 1
    }
    sb.toString
  }
}
