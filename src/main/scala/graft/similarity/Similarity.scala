package graft.similarity

import graft.functions.Fuzz

/** Person-similarity measures (SURVEY E1–E6; reference
  * `src/aroa_etl/person_matching/similarity_measures.py`).
  *
  * Pure Scala kernels — they run inside the blocked similarity join's
  * score UDF and inside clustering's per-component refinement. All scores
  * are 0–100 with −1 = "not comparable" (absent/empty field).
  */
object Similarity {

  /** E1 `number_diff`: exponential closeness penalty
    * `max(0, 100 − (5^|a−b| − 1))`.
    */
  def numberDiff(a: Int, b: Int): Double = {
    val d = math.abs(a - b)
    if (d > 3) 0.0 // 5^4-1 = 624 > 100; avoids overflow for large gaps
    else math.max(0.0, 100.0 - (math.pow(5, d) - 1))
  }

  // hoisted: these run once per SCORED PAIR inside the blocked join's
  // UDF — compiling them per call was millions of Pattern.compile
  private val PackedDate = "^(\\d{4})(\\d{2})(\\d{2})\\.?0?$".r
  private val DottedDate = "^(\\d{2})\\.(\\d{2})\\.(\\d{4})$".r
  private val NumPart = "[1-9]\\d*".r

  /** D5 `parse_date`: `yyyymmdd(.0)` or `dd.mm.yyyy` → (y, m, d). */
  def parseDate(date: String): Option[(Int, Int, Int)] = {
    if (date == null) return None
    date match {
      case PackedDate(y, m, d) => Some((y.toInt, m.toInt, d.toInt))
      case DottedDate(d, m, y) => Some((y.toInt, m.toInt, d.toInt))
      case _                   => None
    }
  }

  private def partScore(a: Int, b: Int): Double =
    if (a == 0 || b == 0) -1.0 else numberDiff(a, b)

  /** E2 `date_similarity`: per-part scores with zero-parts excluded and a
    * day↔month swap tried both ways (the better sum wins).
    */
  def dateSimilarity(date1: String, date2: String): Double =
    dateMemo(date1, date2)(dateSimilarityRaw)

  private def dateSimilarityRaw(date1: String, date2: String): Double = {
    (parseDate(date1), parseDate(date2)) match {
      case (Some((y1, m1, d1)), Some((y2, m2, d2))) =>
        val yearScore = partScore(y1, y2)
        var monthScore = partScore(m1, m2)
        var dayScore = partScore(d1, d2)
        // reversed: day1 vs month2, month1 vs day2
        val monthRev = partScore(d1, m2)
        val dayRev = partScore(m1, d2)
        if (monthScore + dayScore <= monthRev + dayRev) {
          monthScore = monthRev; dayScore = dayRev
        }
        var score = 100.0
        for (s <- Seq(yearScore, monthScore, dayScore) if s >= 0)
          score -= (100 - s)
        math.max(0.0, score)
      case _ => -1.0
    }
  }

  /** `__not_empty` (similarity_measures.py:76-77). */
  def notEmpty(field: String): Boolean =
    field != null && field.nonEmpty && field != "00000000" && field != "-1.0" && field != "-1"

  /** E3 `simple_date_matcher`: fraction (≤3) of numeric parts shared. */
  def simpleDateMatcher(src: String, target: String): Double = {
    if (!notEmpty(src) || !notEmpty(target)) return -1.0
    val srcParts = NumPart.findAllIn(src).toSeq
    val trgParts = NumPart.findAllIn(target).toSet
    val shared = math.min(3, srcParts.count(trgParts.contains))
    shared / 3.0 * 100.0
  }

  /** Bounded per-thread memo for the short-string scoring kernels (r21).
    *
    * The blocked joins score millions of candidate pairs, but the DISTINCT
    * (name, name) / (date, date) argument pairs number in the thousands —
    * name corpora are Zipf-distributed, and co-bucketed candidates share
    * prefixes by construction — so a hash probe (≈50 ns) replaces a
    * 1-3 µs kernel on almost every call. Pure functions, so memoization
    * is semantics-free; per-THREAD maps need no synchronization on the
    * hot path. Long inputs bypass the memo (keys would hold big strings
    * for a low hit rate — free text goes through the registered SQL UDFs,
    * not these person matchers). `clear()` on overflow keeps residency
    * bounded at cap × threads with zero bookkeeping; a full-and-cleared
    * map just re-fills from the live key distribution.
    *
    * NOTE: a plan-level memo (distinct pairs + broadcast join-back) was
    * A/B'd twice in earlier rounds and LOST (see PersonMatching's
    * setScoreCol scaladoc) — the shuffles cost more than the kernels.
    * This is the opposite shape: no plan change, no shuffle, just a
    * thread-local cache inside the existing UDF dispatch.
    */
  private final class PairMemo(cap: Int, maxKeyChars: Int) {
    private val tl = new ThreadLocal[java.util.HashMap[String, java.lang.Double]] {
      override def initialValue(): java.util.HashMap[String, java.lang.Double] =
        new java.util.HashMap[String, java.lang.Double](256)
    }
    def apply(a: String, b: String)(f: (String, String) => Double): Double = {
      if (a == null || b == null || a.length + b.length > maxKeyChars) return f(a, b)
      val m = tl.get()
      // length-prefixed key: a separator char alone would be ambiguous
      // for inputs that may CONTAIN it ("a b"+"c" vs "a"+"b c")
      val k = new java.lang.StringBuilder(a.length + b.length + 4)
        .append(a.length).append(':').append(a).append(b).toString
      val hit = m.get(k)
      if (hit != null) return hit.doubleValue()
      val v = f(a, b)
      if (m.size >= cap) m.clear()
      m.put(k, v)
      v
    }
  }
  private val nameMemo = new PairMemo(cap = 1 << 14, maxKeyChars = 64)
  private val setMemo = new PairMemo(cap = 1 << 14, maxKeyChars = 64)
  private val dateMemo = new PairMemo(cap = 1 << 14, maxKeyChars = 32)

  /** E4 `name_matcher` = `fuzz.ratio` with default_process. */
  def nameMatcher(src: String, target: String): Double =
    nameMemo(src, target) { (a, b) =>
      if (notEmpty(a) && notEmpty(b)) Fuzz.ratio(a, b) else -1.0
    }

  /** E5 `name_set_matcher` = `fuzz.token_set_ratio`. */
  def nameSetMatcher(src: String, target: String): Double =
    setMemo(src, target) { (a, b) =>
      if (notEmpty(a) && notEmpty(b)) Fuzz.tokenSetRatio(a, b) else -1.0
    }

  /** A person record for matching/clustering; null field = absent. */
  final case class Person(
      gname: String,
      lname: String,
      dob: String = null,
      pob: String = null,
      prisonerNumber: String = null)

  /** E6 `person_similarity` (similarity_measures.py:113-164): weighted
    * combiner — primary = (lname + gname token-set)/2; secondary =
    * mean(prisoner ratio, date sim) folded 2/3 : 1/3; other = birthplace
    * ratio folded 3/4 : 1/4.
    *
    * @param useDate / usePrisoner / usePob mirror "column configured" in
    *   the reference (a configured-but-empty date still contributes 0).
    */
  def personSimilarity(
      src: Person, trg: Person,
      useDate: Boolean = true,
      usePrisoner: Boolean = true,
      usePob: Boolean = true,
      nameOnly: Boolean = false,
      nonNamesOptional: Boolean = false,
      dateMatcher: (String, String) => Double = dateSimilarity): Double = {

    val primaryScores = Seq(
      math.max(0, nameSetMatcher(src.lname, trg.lname)),
      math.max(0, nameSetMatcher(src.gname, trg.gname)))
    val primary = primaryScores.sum / 2
    if (nameOnly) return primary
    personSimilarityFrom(primary, src, trg,
      useDate, usePrisoner, usePob, nonNamesOptional, dateMatcher)
  }

  /** E6 with the name `primary` supplied by the caller — the combine
    * stage used when the token-set kernels were memoized per distinct
    * name pair. Arithmetic identical to [[personSimilarity]].
    */
  def personSimilarityFrom(
      primary: Double,
      src: Person, trg: Person,
      useDate: Boolean,
      usePrisoner: Boolean,
      usePob: Boolean,
      nonNamesOptional: Boolean = false,
      dateMatcher: (String, String) => Double = dateSimilarity): Double = {
    val secondaryScores =
      (if (usePrisoner) Seq(nameMatcher(src.prisonerNumber, trg.prisonerNumber)) else Nil) ++
        (if (useDate) Seq(math.max(0, dateMatcher(src.dob, trg.dob))) else Nil)
    val kept = secondaryScores.filter(_ >= 0)
    val secondary =
      if (kept.nonEmpty) kept.sum / kept.size
      else if (nonNamesOptional) -1.0
      else 0.0

    val otherScores = (if (usePob) Seq(nameMatcher(src.pob, trg.pob)) else Nil).filter(_ >= 0)
    val other = if (otherScores.nonEmpty) otherScores.sum / otherScores.size else -1.0

    var score = primary
    if (secondary >= 0) score = 2.0 / 3 * score + 1.0 / 3 * secondary
    if (other >= 0) score = 3.0 / 4 * score + 1.0 / 4 * other
    score
  }
}
