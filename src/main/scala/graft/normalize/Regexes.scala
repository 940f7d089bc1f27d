package graft.normalize

/** Regex conditions for column processing (reference
  * `src/aroa_etl/attribute_processing/regex_conditions.py` — ported
  * verbatim; Java and Python regex dialects agree for every pattern here).
  * These tables ARE the spec: downstream QA counts and split shapes were
  * tuned against exactly these patterns.
  *
  * Python-`\s` parity (r20): on `str`, Python's `\s` (and `str.strip`)
  * is the Unicode White_Space property PLUS the information separators
  * U+001C-001F (`'\x1c'.isspace()` is True); Java's `(?U)\s` is
  * White_Space only. Every `\s` the reference wrote is therefore
  * spelled [[Regexes.PyS]] here — the r20 golden probes proved the gap
  * is user-visible in all four normalization families (a `\x1e` inside
  * a name is a separator to the reference, a letter to `(?U)\s`).
  */
object Regexes {
  /** Python's `\s` on str: `(?U)\s` ∪ U+001C-001F. */
  val PyS = "[\\s\\x1c-\\x1f]"
  /** Class-body form, for composing inside existing `[...]` classes. */
  val PySBody = "\\s\\x1c-\\x1f"
  /** Rewrite every `\s` in a reference pattern to [[PyS]] — class-aware:
    * a `\s` inside an existing `[...]` gets the body form so the class
    * stays flat (`[\.\s]` → `[\.\s\x1c-\x1f]`, not a nested class).
    */
  private[graft] def pyS(p: String): String = {
    val sb = new java.lang.StringBuilder(p.length + 16)
    var i = 0
    var inClass = false
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) {
        if (p.charAt(i + 1) == 's') sb.append(if (inClass) PySBody else PyS)
        else sb.append(c).append(p.charAt(i + 1))
        i += 2
      } else {
        if (c == '[' && !inClass) inClass = true
        else if (c == ']' && inClass) inClass = false
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  val DashWords = pyS(
    "(?U)(?i)\\bblank\\b|\\b\\[blank\\]\\b|\\b\\(blank\\)\\b|\\bblanc\\b|\\bnone\\b|\\bleer\\b|nicht bekannt|\\bk\\.+\\s*a\\b\\.*|\\bk\\.*\\s*a\\b\\.+|\\bnn\\b|\\bfehlt\\b|\\bempty\\b|\\bmissing\\b|\\bna\\b|\\bNA\\b|\\bNa\\b|\\bnot\\b|unklear|keine angabe|entfällt|unavailable|not listet|not statet|no information|\\bno\\b|nr\\. unbekannt|nicht angegeben|keine nummer|unknown|unbekant|\\bnil\\b|no data|xxx|unbekannt\\b|\\bkeine\\b|\\bohne\\b|_|^0+$")
  val DeletedWords =
    "(?U)(?i)lined out|crossed out|durchgestrichen|gestrichen|scored out|\\[strikethrough\\]|\"+"
  val QuestionMarkWords =
    "(?U)(?i)illegible|unclear|unsure|not clear|unreadable|unklar|nicht erkennbar|nicht lesbar|\\?+|unlesbar|unleserlich|ungenau|andere angabe"
  val SemicolonWords =
    "(?U)(?i),|\\bor\\b|\\boder\\b|\\band\\b|\\bund\\b|/|\\(|\\)|:|\\[|\\]"

  val KeyWords =
    pyS("(?U)(\\b|\\()(mr\\.|mrs\\.|frau|fr\\.\\s|herr|herrn|frl\\.|ing\\.|tote|toter|died|neugeborenes|unbekannter\\stoter|unbekannte\\stote|auch|vel|freifrau|prinz|prinzessin|erbprinz|freiherr|freifr|reichsgraf|reichsgräfin|graf|gräfin|freiin|säugling|kind|wwe\\.|gefr\\.|soldat|baron|baronin|hr\\.|ehefrau|vel|alias|baby|wwe|schwester|wife|gattin|gatte|or|oder|od\\.\\s|jude|jüdin|bruder|heil|hitler)(\\s|\\b|\\)|$)")

  val AcademicTitle = "(?U)\\b([dD]r\\.|[pP]rof\\.|[mM]udr\\.)"

  val NobleName =
    pyS("(?U)\\b(?![a-z]\\')(van(([^a-zA-Z]+(der|den|de|d\\.))|\\.)?|von(([^a-zA-Z]+(der|den|de|d\\.))|\\.)?|de la|del|di|der|den|vom|dal|della|dell|dalla|da|d|(v\\.\\s?d\\.)|v\\.|von\\.|d\\.|du|de|le|la|v|d|mc|ter|ten|te|san)(\\b|\\s)(?=[a-zA-Z]){2,}")
  val NoblePrefixClean = "[^a-zA-Z]"

  val BirthName = "(?U)((\\b)(geborene|geb\\.|geb|geboren|nee|née|nèe|zd\\.|zd)(\\b).*)"
  val BirthNameClean = "(?U)((\\b)(geborene|geb\\.|geb|geboren|nee|née|nèe|zd\\.|zd)(\\b).)"

  val StripSemicolon = "^;*|;*$"
  val NameSemicolonTransformation =
    pyS("(?U)(?<!\\b(d))(?<!\\b(da|de|di|du|d\\.|la|le|mc|te|v\\.))(?<!\\b(dal|del|der|den|ter|ten|van|vom|von|san))(?<!\\b(von\\.))(?<!\\b(della|dalla))(\\s;|;\\s|\\s+|\\,|\\,\\s|\\-|;+|\\\\)")
  val SemicolonTransformation = pyS("(?U)(\\s;|;\\s|\\s|\\,|\\-|;+|\\\\)+")

  val LetterSpacing = pyS("(?U)\\b([A-Za-z])\\s+(?=[A-Za-z]\\b)")

  val Qa = "[\\(\\)\\[\\]0-9\\?,:_\\/\\*\\\"#]|\\.\\.|^-|-$|[^a-zA-Z]-[^a-zA-Z]"
  val QaPrisonerNo = "(?U)(.*[^0-9;" + PySBody + "\\.\\/aAbBrRzZ]+.*)"
  val QaNoEntry = "^-$"
  val QaPrisonerNoNoEntry = "^-$|[aAbBrRzZ]"

  val PrisonerNumberCharacterSeparator = pyS("(?U)(?<=[aAbBrRzZ]{1})(\\s|-)(?=[0-9]{2,})")

  val Digit4Year = "^[12][0-9]{3}$"
  val DateSplit = pyS("(?U)(\\.\\s*|\\/|,\\s*|\\s+|\\s|;|(?<=[0-9])(-)(?=[0-9]))+")
  val NoDoubleZerosMd = "^0+(?=[0-9]{2})"
  val NoDoubleZerosY = "^0+(?=[0-9]{4})"

  /** Month-name → number chains, applied in order on the lowercased value. */
  val MonthCorrections: Seq[(String, String)] = Seq(
    "jan[a-z]*" -> "01", "feb[a-z]*" -> "02",
    "(mär[a-z]*)|(mar[a-z]*)|(maer[a-z]*)" -> "03",
    "a.ril" -> "04", "ma[a-z]*|peut" -> "05",
    "(jun[a-z]*)|(juin)" -> "06", "jul[a-z]*|juil[a-z]*" -> "07",
    "aug[a-z]*|ao[a-z]*|ag[a-z*]" -> "08", "sep[a-z]*" -> "09",
    "o[c|k]t[a-z]*" -> "10", "nov[a-z]*" -> "11", "d.c[a-z]*" -> "12")
}
