package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fuzz, NamePreprocess}
import graft.similarity.Similarity

/** Golden tests for the fuzzy-similarity and name-preprocessing kernels.
  * Expected values are hand-derived from the published algorithm
  * definitions (Indel ratio = 100·(1 − (|a|+|b|−2·LCS)/(|a|+|b|)); Jaro
  * with true-division transposition halving), including documented
  * rapidfuzz examples.
  */
class FuzzSpec extends AnyFunSuite {
  private def approx(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-6

  test("Indel ratio matches hand-derived values") {
    // documented rapidfuzz example: 96.55 without processing, 100 with
    assert(approx(Fuzz.ratioRaw("this is a test", "this is a test!"), 100.0 * (1 - 1.0 / 29)))
    assert(Fuzz.ratio("this is a test", "this is a test!") === 100.0)
    // kitten/sitting: LCS=4 -> indel 5 -> 100*(1-5/13)
    assert(approx(Fuzz.ratio("kitten", "sitting"), 100.0 * (1 - 5.0 / 13)))
    // Müller/Mueller: LCS=5 over 6+7 chars
    assert(approx(Fuzz.ratio("Müller", "Mueller"), 100.0 * (1 - 3.0 / 13)))
    assert(Fuzz.ratio("", "") === 100.0)
    assert(Fuzz.ratio("abc", "") === 0.0)
  }

  test("bit-parallel LCS agrees with the DP reference on a randomized sweep") {
    // seeded, not time-derived: deterministic across runs
    val rnd = new scala.util.Random(0x5eed16)
    val alphabets = Seq("ab", "abcde", "abcdefghij üöé", "一二三ab ")
    for (trial <- 0 until 2000) {
      val alpha = alphabets(trial % alphabets.size)
      // lengths sweep across the 64-char word boundary on both sides
      val la = rnd.nextInt(70)
      val lb = rnd.nextInt(70)
      def mk(len: Int) = {
        val sb = new StringBuilder
        var i = 0
        while (i < len) { sb += alpha.charAt(rnd.nextInt(alpha.length)); i += 1 }
        sb.toString
      }
      val a = mk(la)
      val b = mk(lb)
      assert(Fuzz.lcsLength(a, b) === Fuzz.lcsLengthDp(a, b),
        s"lcsLength mismatch on a='$a' b='$b'")
    }
    // pinned edges: full-word 64-char inputs (bit 63 in play), empty
    // side, and the char-127/128 ascii-table boundary
    val w64 = "ab" * 32
    assert(Fuzz.lcsLength(w64, w64) === 64)
    assert(Fuzz.lcsLength(w64, "c" * 64) === 0)
    assert(Fuzz.lcsLength("a" + "\u007f" + "b", "\u007f" + "\u0080") === 1)
  }

  test("multi-word LCS agrees with the DP reference past the 64-char word") {
    val rnd = new scala.util.Random(0xb10c)
    val alphabets = Seq("ab", "abcdefgh", "abcdefghij üöé一二")
    for (trial <- 0 until 400) {
      val alpha = alphabets(trial % alphabets.size)
      // shorter side 65–300 chars: 2–5 words, boundary crossings at
      // 64/128/192/256
      val la = 65 + rnd.nextInt(236)
      val lb = la + rnd.nextInt(120)
      def mk(len: Int) = {
        val sb = new StringBuilder
        var i = 0
        while (i < len) { sb += alpha.charAt(rnd.nextInt(alpha.length)); i += 1 }
        sb.toString
      }
      val a = mk(la)
      val b = mk(lb)
      assert(Fuzz.lcsLength(a, b) === Fuzz.lcsLengthDp(a, b),
        s"multi-word lcsLength mismatch on la=$la lb=$lb alpha='$alpha'")
    }
    // identical-char runs force maximal carry chains across every word
    // boundary (the add saturates and carries word to word)
    assert(Fuzz.lcsLength("a" * 100, "a" * 200) === 100)
    assert(Fuzz.lcsLength("a" * 256, "a" * 256) === 256)
    // exact word-multiple lengths: top bit of the last word in play
    assert(Fuzz.lcsLength("ab" * 64, "ab" * 64) === 128)
    assert(Fuzz.lcsLength(("x" * 64) + ("y" * 64), ("y" * 64) + ("x" * 64)) === 64)
    // non-Latin-1 chars past the direct table, in the multi-word branch:
    // the 70-char run of 一 matches the 35 一s of the alternating side
    assert(Fuzz.lcsLength("一" * 70, "一二" * 35) === 35)
    assert(Fuzz.lcsLength("一" * 70, "一" * 90) === 70)
  }

  test("LCS kernel is thread-safe under concurrent mixed-length calls") {
    // the per-thread mask tables (ASCII single-word + Latin-1 multi-word)
    // must never leak bits across calls on a reused thread; hammer both
    // branches from a pool and compare every result to the DP
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = (0 until 8).map { worker =>
        Future {
          val rnd = new scala.util.Random(1000 + worker)
          val alpha = "abcdefgh üö一"
          var i = 0
          while (i < 500) {
            val la = 1 + rnd.nextInt(150) // crosses the 64-char dispatch
            val lb = 1 + rnd.nextInt(150)
            def mk(len: Int) =
              (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
            val a = mk(la)
            val b = mk(lb)
            val got = Fuzz.lcsLength(a, b)
            val want = Fuzz.lcsLengthDp(a, b)
            assert(got === want, s"worker $worker iter $i: a='$a' b='$b'")
            i += 1
          }
          true
        }
      }
      assert(Await.result(Future.sequence(futures), 120.seconds).forall(identity))
    } finally pool.shutdown()
  }

  test("token_set_ratio: set-equal strings are 100; empty semantics") {
    assert(Fuzz.tokenSetRatio("fuzzy was a bear", "fuzzy fuzzy was a bear") === 100.0)
    assert(Fuzz.tokenSetRatio("bear was fuzzy", "fuzzy was a bear") === 100.0)
    // both sides empty after processing -> 100 (rapidfuzz semantics)
    assert(Fuzz.tokenSetRatio("???", "!!!") === 100.0)
    assert(Fuzz.tokenSetRatio("abc", "???") === 0.0)
    // partial overlap, hand-derived: sect="three two"(9), diffs "one"/"four"
    assert(approx(Fuzz.tokenSetRatio("one two three", "two three four"),
      100.0 * (1 - 4.0 / 22)))
  }

  test("Jaro with jellyfish true-division transpositions") {
    assert(approx(Fuzz.jaro("MARTHA", "MARHTA"), (1.0 + 1.0 + (6 - 1) / 6.0) / 3))
    // odd transposition count: 3 mismatched alignments -> t = 1.5
    assert(approx(Fuzz.jaro("abcdef", "bcadef"), (1.0 + 1.0 + (6 - 1.5) / 6.0) / 3))
    assert(Fuzz.jaro("", "") === 1.0)
    assert(Fuzz.jaro("a", "") === 0.0)
    assert(Fuzz.jaro("same", "same") === 1.0)
  }

  test("preprocess_name chains (string_utils order, quirks preserved)") {
    // müller: ü->u then double-l collapse
    assert(NamePreprocess.preprocessName("Müller") === "muler")
    // schwartz: w->v, tz->z
    assert(NamePreprocess.preprocessName("Schwartz") === "schvarz")
    // goethe: oe->a quirk, th->t
    assert(NamePreprocess.preprocessName("Goethe") === "gate")
    // last names: owa$ strip then w->v
    assert(NamePreprocess.preprocessLastName("Nowakowa") === "novak")
    assert(NamePreprocess.preprocessLastName("Petersohn") === "peterson")
    assert(NamePreprocess.preprocessLastName("Schmidt geb. Meyer") === "schmidt")
  }

  test("E1-E3 similarity measures") {
    assert(Similarity.numberDiff(5, 5) === 100.0)
    assert(Similarity.numberDiff(5, 6) === 96.0)
    assert(Similarity.numberDiff(5, 7) === 76.0)
    assert(Similarity.numberDiff(5, 9) === 0.0)
    assert(Similarity.dateSimilarity("19430312", "12.03.1943") === 100.0)
    // day<->month swap rescues reversed dates
    assert(Similarity.dateSimilarity("19430312", "19431203") === 100.0)
    // zero parts are excluded, not penalized
    assert(Similarity.dateSimilarity("19430000", "19430812") === 100.0)
    assert(Similarity.dateSimilarity("bogus", "19430812") === -1.0)
    assert(Similarity.simpleDateMatcher("12.03.1943", "12.03.1943") === 100.0)
    assert(approx(Similarity.simpleDateMatcher("12.03.1943", "12.05.1943"), 2.0 / 3 * 100))
  }

  test("E6 person_similarity combiner weights") {
    import Similarity.Person
    val a = Person("hans", "muler", "19430312", "berlin", "111")
    // identical person -> 100 on every axis
    assert(approx(Similarity.personSimilarity(a, a), 100.0))
    // names only equal, date differs by a year, no pob/prisoner on trg
    val b = Person("hans", "muler", "19440312", null, null)
    // primary=100; secondary=date 96; no other
    val expected = 2.0 / 3 * 100 + 1.0 / 3 * 96
    assert(approx(Similarity.personSimilarity(a, b), expected))
  }

  test("E6 config-branch matrix: every flag path of the combiner, hand-derived") {
    import Similarity.Person
    val full = Person("hans", "muler", "19430312", "berlin", "111")
    // trg differs on every non-name axis so each branch is observable:
    // date +1 year -> 96, prisoner 111 vs 121 -> indel (6-2)/6, pob equal
    val trg = Person("hans", "muler", "19440312", "berlin", "121")
    val pris = Fuzz.ratio("111", "121") // = 100*(1-2/6), pinned above

    // nameOnly returns primary BEFORE any secondary/other work — flags
    // and non-name fields are dead
    assert(Similarity.personSimilarity(full, trg, nameOnly = true) === 100.0)
    assert(Similarity.personSimilarity(full, trg,
      useDate = false, usePrisoner = false, usePob = false, nameOnly = true) === 100.0)

    // full chain: secondary = mean(prisoner, date), both folds fire
    val fullExp = 3.0 / 4 * (2.0 / 3 * 100 + 1.0 / 3 * ((pris + 96) / 2)) + 1.0 / 4 * 100
    assert(approx(Similarity.personSimilarity(full, trg), fullExp))

    // no non-name column configured: kept empty -> secondary 0 drags the
    // score (reference: `secundary_score = 0`), pob fold still fires
    assert(approx(Similarity.personSimilarity(full, trg,
      useDate = false, usePrisoner = false, usePob = false), 2.0 / 3 * 100))
    assert(approx(Similarity.personSimilarity(full, trg,
      useDate = false, usePrisoner = false),
      3.0 / 4 * (2.0 / 3 * 100) + 1.0 / 4 * 100))
    // ... unless nonNamesOptional: secondary -1 -> fold skipped entirely
    assert(Similarity.personSimilarity(full, trg,
      useDate = false, usePrisoner = false, usePob = false,
      nonNamesOptional = true) === 100.0)

    // THE asymmetry: a configured-but-absent prisoner is FILTERED
    // (name_matcher -1 dropped before the mean) but a configured
    // unparseable date is CLAMPED (max(0, -1) = 0 stays in the mean) —
    // reference similarity_measures.py:135-139
    val noPris = Person("hans", "muler", "19440312", "berlin", null)
    assert(approx(Similarity.personSimilarity(full, noPris, usePob = false),
      2.0 / 3 * 100 + 1.0 / 3 * 96)) // kept = [date] only
    val badDob = Person("hans", "muler", "n/a", "berlin", "111")
    assert(approx(Similarity.personSimilarity(full, badDob, usePob = false),
      2.0 / 3 * 100 + 1.0 / 3 * ((100 + 0.0) / 2))) // kept = [prisoner 100, clamped date 0]
    // and because the clamped date is ALWAYS >= 0, nonNamesOptional is
    // inert whenever useDate=true: kept can never be empty
    assert(approx(Similarity.personSimilarity(full, badDob, usePob = false,
      nonNamesOptional = true),
      2.0 / 3 * 100 + 1.0 / 3 * ((100 + 0.0) / 2)))
    // nonNamesOptional DOES fire when the only survivor is a filtered
    // prisoner: useDate=false + absent prisoner -> kept empty
    assert(Similarity.personSimilarity(full, noPris, useDate = false,
      usePob = false, nonNamesOptional = true) === 100.0)
    assert(approx(Similarity.personSimilarity(full, noPris, useDate = false,
      usePob = false), 2.0 / 3 * 100))

    // pob: absent -> other -1 -> the 3/4:1/4 fold is skipped, not zeroed
    val noPob = Person("hans", "muler", "19440312", null, "121")
    assert(approx(Similarity.personSimilarity(full, noPob),
      2.0 / 3 * 100 + 1.0 / 3 * ((pris + 96) / 2)))

    // empty names: token-set -1 clamps to 0 per name, primary = 0; the
    // secondary/other folds still run on the zero base
    val anonA = Person(null, null, "19430312", "berlin", "111")
    val anonB = Person(null, null, "19430312", "berlin", "111")
    assert(approx(Similarity.personSimilarity(anonA, anonB),
      3.0 / 4 * (2.0 / 3 * 0 + 1.0 / 3 * 100) + 1.0 / 4 * 100))
    // one-sided empty name behaves the same as both-sided (-1 clamp)
    val half = Person("hans", null, "19430312", "berlin", "111")
    assert(approx(Similarity.personSimilarity(half, full, nameOnly = true),
      (0.0 + 100.0) / 2))

    // sentinel strings ("-1", "00000000") are not-comparable for the
    // NAME/prisoner kernels but PARSE as all-zero for date_similarity,
    // where zero parts are excluded -> a "00000000" dob scores 100, while
    // the simple matcher's notEmpty guard rejects it -> kept mean differs
    val zeroDob = Person("hans", "muler", "00000000", "berlin", "111")
    assert(approx(Similarity.personSimilarity(full, zeroDob, usePob = false),
      2.0 / 3 * 100 + 1.0 / 3 * ((100 + 100.0) / 2)))
    assert(approx(Similarity.personSimilarity(full, zeroDob, usePob = false,
      dateMatcher = Similarity.simpleDateMatcher),
      2.0 / 3 * 100 + 1.0 / 3 * ((100 + 0.0) / 2)))
  }
}
