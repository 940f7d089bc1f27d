package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.{Fuzz, NamePreprocess}
import graft.text.Dedup

/** Remaining kernel goldens (F18/F19/F23/D4/D6) + seeded property checks
  * for the pure kernels (bounds, symmetry, determinism, idempotence).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  test("F18 OCR confusable repair maps and rejects") {
    // Cyrillic М folds to Latin M; umlauts survive
    assert(NamePreprocess.fixVisualCharacterDecoding("Мüller") === "Müller")
    // >30% confusable characters -> whole value rejected
    assert(NamePreprocess.fixVisualCharacterDecoding("Мü11er") === "")
    assert(NamePreprocess.fixVisualCharacterDecoding("") === "")
  }

  test("F19 name uppercasing fixes per-word casing incl. umlaut words") {
    assert(NamePreprocess.fixNameUppercasing("hans-PETER müller") === "Hans-Peter Müller")
    assert(NamePreprocess.fixNameUppercasing("O'BRIEN") === "O'Brien")
  }

  test("F3 pyTitle is CPython str.title exactly (cased runs, full mappings, sigma)") {
    import graft.normalize.PyText.pyTitle
    // every expected value is CPython 3.11 output, re-verified by the
    // 4.4M-probe all-codepoint TitleSweep (zero mismatches, r20)
    assert(pyTitle(null) === null)
    assert(pyTitle("") === "")
    assert(pyTitle("bob1 bob2") === "Bob1 Bob2")
    assert(pyTitle("weiss-meyer") === "Weiss-Meyer")
    // runs key on CASED, not isLetter: uncased letters reset the run
    assert(pyTitle("אa") === "אA")            // Hebrew aleph
    assert(pyTitle("中a文b") === "中A文B") // CJK
    assert(pyTitle("ʻokina") === "ʻOkina")    // ʻokina (Lm, uncased)
    // ...but cased NON-letters continue runs
    assert(pyTitle("xʰy") === "Xʰy")          // ʰ Lm Other_Lowercase
    assert(pyTitle("aⒶ") === "Aⓐ")            // Ⓐ So Other_Uppercase -> ⓐ
    assert(pyTitle("Ⓐb") === "Ⓐb")
    assert(pyTitle("ⅷx") === "Ⅷx")            // ⅷ Nl -> Ⅷ
    assert(pyTitle("𝕳ello") === "𝕳ello") // 𝕳 cased astral
    assert(pyTitle("na𝖍e") === "Na𝖍e")   // 𝖒 cased astral
    // full one-to-many mappings (SpecialCasing.txt)
    assert(pyTitle("ßa") === "Ssa")                // word-initial ß
    assert(pyTitle("aßb") === "Aßb")          // run-internal ß lowers to itself
    assert(pyTitle("straße") === "Straße")
    assert(pyTitle("ﬁne") === "Fine")              // ﬁ ligature
    assert(pyTitle("ﬃcal") === "Ffical")           // ﬃ
    assert(pyTitle("ŉa") === "ʼNa")           // ŉ -> ʼN
    assert(pyTitle("Aİb") === "Ai̇b")         // lower(İ) = i + combining dot
    assert(pyTitle("İstanbul") === "İstanbul")
    assert(pyTitle("ᾲ x") === "Ὰͅ X")    // ᾲ -> Ὰ + ypogegrammeni
    // titlecase digraphs stay TITLE, not upper
    assert(pyTitle("ǆungla") === "ǅungla")    // ǆ -> ǅ
    assert(pyTitle("ǅx") === "ǅx")
    // final-sigma context rule, incl. case-ignorable look-through
    assert(pyTitle("ΟΔΥΣΣΕΥΣ") === "Οδυσσευς")
    assert(pyTitle("ΑΣ Β") === "Ας Β")
    assert(pyTitle("Σ") === "Σ")              // run start: title path, no lowering
    assert(pyTitle("ΑΣ̈") === "Ας̈") // mark is ignorable -> still final
    assert(pyTitle("ΑΣ'") === "Ας'")  // apostrophe ignorable -> final
    assert(pyTitle("Α'Σ") === "Α'Σ")  // ' uncased -> sigma takes TITLE path
    assert(pyTitle("don't") === "Don'T")                // ' resets the run (uncased)
    assert(pyTitle("1a2b") === "1A2B")
  }

  test("F23 known abbreviation completion inside the consensus pipeline") {
    val m = new graft.consensus.ColMatcher().withKnownAbbreviationsCompleted()
    assert(m(Vector("Frankfurter Str.", "Frankfurter Straße")) === Some("Frankfurter Straße"))
    assert(m(Vector("Bln. Mitte", "Berlin Mitte")) === Some("Berlin Mitte"))
  }

  test("D6 packed date reformat") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val out = Seq("19430312").toDF("d")
      .select(graft.normalize.Dates.reformatDate(org.apache.spark.sql.functions.col("d")))
      .head().getString(0)
    assert(out === "12.03.1943")
  }

  test("D4 date timing check") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = Seq(
      ("1940", "01", "01", "1943", "05", "05"),
      ("1944", "01", "01", "1943", "05", "05"),
      ("1943", "06", "01", "1943", "05", "05"),
      ("", "01", "01", "1943", "05", "05"))
      .toDF("y1", "m1", "d1", "y2", "m2", "d2")
    import org.apache.spark.sql.functions.col
    val (timing, qa) = graft.normalize.Dates.dateTimingCheck(
      col("y1"), col("m1"), col("d1"), col("y2"), col("m2"), col("d2"))
    val rows = df.select(timing.as("t"), qa.as("q")).collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    assert(rows(0) === ("consistent", false))
    assert(rows(1) === ("year_t1 > year_t2", true))
    assert(rows(2) === ("month_t1 > month_t2", true))
    assert(rows(3) === ("consistent", false)) // unparseable -> consistent
  }

  // ---- seeded property checks -------------------------------------------

  private val rnd = new Random(42)
  private def randomString(): String = {
    val alphabet = "abcdefghij ßüöä .-?123"
    (0 until rnd.nextInt(16)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("ratio/jaro/token_set: bounds, symmetry, identity (500 random pairs)") {
    for (_ <- 1 to 500) {
      val a = randomString(); val b = randomString()
      val r = Fuzz.ratio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(math.abs(r - Fuzz.ratio(b, a)) < 1e-9, s"ratio asymmetric for '$a' '$b'")
      assert(Fuzz.ratio(a, a) === 100.0)
      val j = Fuzz.jaro(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - Fuzz.jaro(b, a)) < 1e-9, s"jaro asymmetric for '$a' '$b'")
      val t = Fuzz.tokenSetRatio(a, b)
      assert(t >= 0.0 && t <= 100.0)
      assert(math.abs(t - Fuzz.tokenSetRatio(b, a)) < 1e-9)
    }
  }

  test("minhash signatures are deterministic and set-order-independent") {
    for (_ <- 1 to 100) {
      val shingles = (0 until rnd.nextInt(20) + 1).map(_ => randomString())
      val sig1 = Dedup.minHashSignature(shingles, 32).toSeq
      val sig2 = Dedup.minHashSignature(rnd.shuffle(shingles), 32).toSeq
      assert(sig1 === sig2)
    }
  }

  test("minhash signature agreement approximates jaccard on near-equal sets") {
    val base = (0 until 200).map(i => s"shingle_$i")
    val variant = base.drop(20) ++ (0 until 20).map(i => s"other_$i") // jaccard 180/220
    val s1 = Dedup.minHashSignature(base, 256)
    val s2 = Dedup.minHashSignature(variant, 256)
    val agree = s1.zip(s2).count { case (x, y) => x == y } / 256.0
    val trueJaccard = 180.0 / 220.0
    assert(math.abs(agree - trueJaccard) < 0.1, s"agreement $agree vs $trueJaccard")
  }

  test("sort_list_in_column is idempotent; fingerprint is strip-stable") {
    for (_ <- 1 to 200) {
      val s = (0 until rnd.nextInt(6)).map(_ => rnd.nextInt(1000).toString).mkString(";")
      val once = graft.normalize.PyText.sortListInColumn(s)
      assert(graft.normalize.PyText.sortListInColumn(once) === once)
    }
    for (_ <- 1 to 200) {
      val s = randomString()
      assert(graft.text.TextStats.fingerprint(s) ===
        graft.text.TextStats.fingerprint(s.replaceAll("\\s+", " ").trim))
    }
  }

  test("token_set_ratio fast paths equal the full formula (seeded sweep)") {
    // reference implementation of the full formula, no shortcuts — the
    // fast paths in Fuzz.tokenSetRatio must be value-identical to this
    def full(a: String, b: String): Double = {
      val ta = Fuzz.defaultProcess(a).split("\\s+").filter(_.nonEmpty).toSet
      val tb = Fuzz.defaultProcess(b).split("\\s+").filter(_.nonEmpty).toSet
      if (ta.isEmpty && tb.isEmpty) return 100.0
      if (ta.isEmpty || tb.isEmpty) return 0.0
      val sect = ta.intersect(tb)
      val diffAb = (ta -- tb).toArray.sorted
      val diffBa = (tb -- ta).toArray.sorted
      if (sect.nonEmpty && (diffAb.isEmpty || diffBa.isEmpty)) return 100.0
      val abJoined = diffAb.mkString(" ")
      val baJoined = diffBa.mkString(" ")
      val sectLen = if (sect.isEmpty) 0 else sect.iterator.map(_.length).sum + sect.size - 1
      val sectBonus = if (sectLen != 0) 1 else 0
      val sectAbLen = sectLen + sectBonus + abJoined.length
      val sectBaLen = sectLen + sectBonus + baJoined.length
      def norm(dist: Int, lensum: Int): Double =
        if (lensum == 0) 1.0 else 1.0 - dist.toDouble / lensum
      var best = norm(Fuzz.indelDistance(abJoined, baJoined), sectAbLen + sectBaLen)
      if (sectLen != 0) {
        best = math.max(best, norm(sectBonus + abJoined.length, sectLen + sectAbLen))
        best = math.max(best, norm(sectBonus + baJoined.length, sectLen + sectBaLen))
      }
      best * 100.0
    }
    val alphabet = "ab -.19"
    def rs(): String =
      (0 until rnd.nextInt(10)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 5000) {
      val (a, b) = (rs(), rs())
      assert(Fuzz.tokenSetRatio(a, b) === full(a, b), s"'$a' vs '$b'")
    }
    // and the equal-input path of ratio
    for (_ <- 1 to 500) {
      val s = rs()
      assert(Fuzz.ratio(s, s) === 100.0)
    }
  }

  test("AviCodec mux→demux is bit-exact for arbitrary payloads (seeded sweep)") {
    import graft.text.Multimodal.AviCodec
    val rnd = new Random(4202L)
    for (trial <- 1 to 300) {
      val nFrames = rnd.nextInt(7) // 0..6, incl. the empty clip
      // arbitrary byte payloads, 0..200 bytes, odd lengths included —
      // the demuxer never decodes, so container fidelity is testable
      // independent of image validity
      val frames = Seq.fill(nFrames) {
        val f = new Array[Byte](rnd.nextInt(201)); rnd.nextBytes(f); f
      }
      val w = 1 + rnd.nextInt(64); val h = 1 + rnd.nextInt(64)
      val frameMs = 1L + rnd.nextInt(100)
      val avi = AviCodec.encodeAvi(frames, w, h, frameMs, "MJPG")
      val out = AviCodec.extractFrames(avi)
      assert(out.length === nFrames, s"trial $trial frame count")
      for (t <- frames.indices)
        assert(out(t).sameElements(frames(t)), s"trial $trial frame $t bytes")
      assert(AviCodec.aviMetadata(avi) ===
        Some(("mjpg", w, h, nFrames.toLong, nFrames * frameMs)), s"trial $trial metadata")
    }
  }

  test("AviCodec and WavCodec parsers never throw on mutated or truncated containers") {
    import graft.text.Multimodal.{AviCodec, ImageIoCodec, WavCodec}
    val rnd = new Random(999L)
    val avi = AviCodec.encodeAviPngSeq(8, 6, 3, 40L, 5L)
    val wav = WavCodec.encodeWav(200, 8000, 5L)
    // single- and multi-byte flips anywhere in the container: results may
    // be empty/None or even still parse, but must NEVER escape the
    // None/empty failure contract as an exception from a per-row UDF
    for (_ <- 1 to 2000) {
      val target = if (rnd.nextBoolean()) avi.clone() else wav.clone()
      for (_ <- 0 to rnd.nextInt(4))
        target(rnd.nextInt(target.length)) = rnd.nextInt(256).toByte
      if (target.length == avi.length) {
        AviCodec.extractFrames(target).foreach(f => ImageIoCodec.pixelLumaSum(f))
        AviCodec.aviMetadata(target)
      } else {
        WavCodec.audioMetadata(target)
        WavCodec.sampleSum(target)
        WavCodec.audioStats(target)
        WavCodec.resampleNearest(target, 5000)
      }
    }
    // truncation at every possible cut point, both containers
    for (cut <- 0 until avi.length) {
      val t = avi.take(cut)
      AviCodec.extractFrames(t); AviCodec.aviMetadata(t)
    }
    for (cut <- 0 until wav.length by 7) {
      val t = wav.take(cut)
      WavCodec.audioMetadata(t); WavCodec.sampleSum(t)
    }
  }

  test("AviCodec.aviMetadata rejects a strh whose declared size cannot hold the fields it reads") {
    import graft.text.Multimodal.AviCodec
    val avi = AviCodec.encodeAviPngSeq(8, 6, 3, 40L, 5L)
    assert(AviCodec.aviMetadata(avi).isDefined)
    // locate the strh chunk and declare its size 0: the fccType/handler
    // bytes that follow still spell 'vids', but they now belong to
    // whatever comes AFTER the (empty) strh body — a parser honoring
    // declared sizes must treat this as a corrupt header, not metadata
    val strhAt = avi.indices.indexWhere(i => i + 4 <= avi.length &&
      avi(i) == 's' && avi(i + 1) == 't' && avi(i + 2) == 'r' && avi(i + 3) == 'h')
    assert(strhAt > 0, "muxer output must contain a strh chunk")
    val corrupt = avi.clone()
    corrupt(strhAt + 4) = 0; corrupt(strhAt + 5) = 0
    corrupt(strhAt + 6) = 0; corrupt(strhAt + 7) = 0
    assert(AviCodec.aviMetadata(corrupt) === None,
      "strh declaring size 0 must be a corrupt header (None), not a parsed handler")
  }

  test("text kernels are locale-independent: Turkish default locale must not change case folds") {
    import graft.text.{Dedup, TextStats}
    // Turkish dotted/dotless i is THE locale casing trap: "I".toLowerCase
    // under tr-TR yields U+0131 (dotless), diverging from DuckDB's
    // locale-independent lower() in the q26/q28/q29 oracles. Pin every
    // kernel output under the Turkish default to its Locale.ROOT value.
    val text = "The QUICK Brown FIX Jumped Over I II III"
    val before = java.util.Locale.getDefault
    val rootFp = TextStats.fingerprint(text)
    val rootLang = TextStats.detectLanguage(text)
    val rootSig = Dedup.simHash(text)
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      assert(TextStats.fingerprint(text) === rootFp,
        "fingerprint must not move with the default locale")
      assert(TextStats.detectLanguage(text) === rootLang)
      assert(Dedup.simHash(text) === rootSig,
        "SimHash tokenization must not move with the default locale")
    } finally java.util.Locale.setDefault(before)
  }

  test("DivergenceCover is a fixpoint under case mapping (closure invariant)") {
    // The dual-chain gate's soundness argument (Regexes.DivergenceCover
    // scaladoc): a string with no cover char must STAY cover-free under
    // lower/upper/title, or a chain that case-maps between boundary
    // steps could smuggle a divergent char past the input-side gate.
    // Asserted from checked-in data (PyCase tables + mayDiverge), no
    // external CPython needed — r20 verified it only in tool-side
    // sweeps that regenerate TSVs (r20 VERDICT item 3).
    import graft.normalize.{PyCase, Regexes}
    var cp = 0
    var checked = 0
    while (cp <= 0x10FFFF) {
      if (Character.isDefined(cp) && !(cp >= 0xD800 && cp <= 0xDFFF)) {
        val s = new String(Character.toChars(cp))
        if (!Regexes.mayDiverge(s)) {
          checked += 1
          for (img <- Seq(PyCase.lower(s), PyCase.upper(s), PyCase.title(s)))
            assert(!Regexes.mayDiverge(img),
              f"cover not closed: U+$cp%04X is outside the cover but its " +
                f"case image '$img' contains a cover char")
        }
      }
      cp += 1
    }
    // sanity: the loop really swept the non-cover space. ~52k defined
    // codepoints sit outside the cover on this JDK (the cover contains
    // the entire astral plane plus several large BMP blocks, so "most
    // of Unicode" is IN it); the bound just guards against a refactor
    // accidentally skipping the sweep.
    assert(checked > 40000)
  }

  test("preprocess_name double-letter collapse is single-pass (reference semantics)") {
    // re.sub's non-overlapping matching leaves "aaa" as "aa" — the chain
    // is deliberately NOT idempotent, matching the reference exactly
    assert(NamePreprocess.removeDoubleCharacters("aaa") === "aa")
    assert(NamePreprocess.preprocessName("äääüßj") === "aausi")
    // deterministic on repeated invocation
    for (_ <- 1 to 200) {
      val s = randomString()
      assert(NamePreprocess.preprocessName(s) === NamePreprocess.preprocessName(s))
    }
  }
}
