package graft

import org.apache.spark.sql.functions._
import graft.text.{Ann, Dedup, Multimodal, TextStats}

/** LLM-data operators: dedup kernels, ANN, text analysis, multimodal
  * plumbing — value semantics on controlled inputs.
  */
class TextOpsSpec extends SparkSpec {
  private val session = SparkSpec.spark
  import session.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("group_size") > 1).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Seq[Long]]("member_ids") === Seq(1L, 2L))
    assert(g.head.getAs[Long]("canonical_id") === 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minHashDuplicates(docs, "doc_id", "text",
      Dedup.MinHashConfig(shingleSize = 2, numPerm = 64, bands = 16, jaccardThreshold = 0.4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup pair")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), "near dup pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc")
  }

  test("minhash band join shuffles ids only — shingle payload stays off the wire") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    // 200 fat docs (400 tokens each, token ranges disjoint across docs)
    // ≈ 2 MB of shingle payload per side, plus 5 injected exact dups.
    // The pre-slim plan shuffled every document's shingle array once per
    // band (×16 ≈ 60+ MB); the slim plan shuffles (band, id) keys and
    // rejoins the payload only for surviving candidates.
    val base = spark.range(0, 200).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(399)),
        j => concat(lit("t"), col("id") * 1000 + j)), " ").as("text"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") < 5).select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pairs = Dedup.minHashDuplicates(corpus, "doc_id", "text",
        Dedup.MinHashConfig(shingleSize = 3, numPerm = 64, bands = 16,
          jaccardThreshold = 0.5)).collect()
      assert(pairs.length === 5, "exactly the injected dup pairs")
      var last = -1L
      var tries = 0
      while (bytes.get() != last && tries < 50) { // drain the listener bus
        last = bytes.get(); Thread.sleep(100); tries += 1
      }
      assert(bytes.get() < 16L * 1024 * 1024,
        s"shuffled ${bytes.get()} bytes — is the shingle payload on the wire?")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("simhash: identical texts collide, near dups within hamming 3") {
    assert(Dedup.simHash("a b c") === Dedup.simHash("a b c"))
    val pairs = Dedup.simHashDuplicates(docs, "doc_id", "text", maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 === 0), "exact dup at hamming 0")
    assert(!pairs.exists(p => p._2 == 4L && p._1 <= 3L), "unrelated doc")
  }

  test("ngram jaccard join computes exact jaccard on candidates") {
    val pairs = Dedup.ngramJaccardDuplicates(docs, "doc_id", "text", k = 2, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((1L, 2L))) === 1.0)
    // 8 bigrams each, 7 shared ("lazy dog" vs "lazy cat") -> 7/9
    assert(math.abs(pairs(((1L, 3L))) - 7.0 / 9) < 1e-9)
  }

  test("token counts, ratios, quality") {
    val r = docs.filter(col("doc_id") === 1)
      .select(TextStats.tokenCount(col("text")), TextStats.bpeTokenCount(col("text")),
        TextStats.stopwordRatio(col("text")), TextStats.distinctTokenRatio(col("text")))
      .head()
    assert(r.getInt(0) === 9)
    assert(r.getInt(1) === 9) // nine word pre-tokens
    assert(math.abs(r.getDouble(2) - 2.0 / 9) < 1e-9) // "the" twice
    assert(math.abs(r.getDouble(3) - 8.0 / 9) < 1e-9)
  }

  test("empty and null texts: zero tokens, near-zero quality, no NPE in the dedup kernels") {
    val session = SparkSpec.spark
    import session.implicits._
    val weird = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]),
      (4L, "real text here"), (5L, "real text here"),
      // the r18 cases: Spark trim strips only spaces, so a trim-based
      // guard let tab-only text through (counted its ["",""] split as
      // TWO tokens), and Spark's split keeps trailing empties, so a
      // trailing tab counted one phantom token. Expected values below
      // were cross-verified against the q28/q29 oracle SQL run in
      // DuckDB on this exact corpus at authoring time (SURVEY r18 log).
      (6L, "\t\t"), (7L, "a\t"), (8L, "the the cat\t\n"),
      // the r19 cases: Java regex split ALSO emits a LEADING empty
      // token, so "\thello" tokenized as ["","hello"] = 2 tokens under
      // the r18 trailing-only strip. Both edges now stripped pre-split.
      (9L, "\thello"), (10L, "\n\tthe cat\t "),
      // r19 hostile_diff.py pins: \x0b (VT) IS whitespace in Java's \s
      // (the kernel's semantics; RE2's \s disagrees — the oracle SQL
      // spells out Java's class), and NBSP is NOT whitespace in either
      (11L, "\u000b\u000c"), (12L, "\u000bword\u000b"), (13L, "\u00a0"))
      .toDF("doc_id", "text")
    // tokenCount: the [""] split artifact must not count one phantom token
    val toks = weird.select(col("doc_id"), TextStats.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(toks(1L) === 0 && toks(2L) === 0)
    assert(toks(4L) === 3)
    assert(toks(6L) === 0, "tab-only text must count zero tokens")
    assert(toks(7L) === 1, "trailing tab must not count a phantom token")
    assert(toks(8L) === 3, "trailing whitespace run must not count a phantom token")
    assert(toks(9L) === 1, "leading tab must not count a phantom token")
    assert(toks(10L) === 2, "leading+trailing whitespace must not count phantom tokens")
    assert(toks(11L) === 0, "VT+FF-only text is tokenless (Java \\s includes \\x0b)")
    assert(toks(12L) === 1, "VT-wrapped word is one token")
    assert(toks(13L) === 1, "NBSP is a token char, not whitespace")
    // quality: an empty document must not collect the distinct-token 0.15
    val q = weird.filter(col("doc_id") === 1L)
      .select(TextStats.qualityScore(col("text"))).head().getDouble(0)
    assert(q < 0.2, s"empty doc quality should be near zero, got $q")
    // ...and neither must a tab-only one (pre-r18 its ["",""] split
    // scored distinct ratio 0.5 = a 0.075 phantom quality credit)
    val dr = weird.select(col("doc_id"), TextStats.distinctTokenRatio(col("text")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(dr(6L) === 0.0, s"tab-only distinct ratio: ${dr(6L)}")
    assert(math.abs(dr(8L) - 2.0 / 3) < 1e-9, s"trailing-ws distinct ratio: ${dr(8L)}")
    // leading-ws doc 10 ("the cat"): 2 real tokens, both distinct, one
    // stopword — a phantom leading empty would read 2/3 and 1/3
    assert(dr(10L) === 1.0, s"leading-ws distinct ratio: ${dr(10L)}")
    val sw = weird.filter(col("doc_id") === 8L)
      .select(TextStats.stopwordRatio(col("text"))).head().getDouble(0)
    assert(math.abs(sw - 2.0 / 3) < 1e-9, s"stopword ratio over real tokens only: $sw")
    val sw10 = weird.filter(col("doc_id") === 10L)
      .select(TextStats.stopwordRatio(col("text"))).head().getDouble(0)
    assert(sw10 === 0.5, s"leading-ws stopword ratio: $sw10")
    // minhash over null/empty texts: no NPE, no bogus pairs from the
    // constant empty-signature, real duplicates still found
    val pairs = Dedup.minHashDuplicates(weird, "doc_id", "text",
      Dedup.MinHashConfig(shingleSize = 2, numPerm = 16, bands = 8, jaccardThreshold = 0.4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((4L, 5L)), s"got $pairs")
  }

  test("cosine handles zero vectors: similarity 0, never a NaN that ranks first") {
    val session = SparkSpec.spark
    import session.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f))) // all-zero: cosine undefined
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 1L)
    val top = graft.text.Ann.cosineTopK(q, vecs, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    // NaN sorts above every double under desc — the zero vector must
    // rank LAST (score 0), never first
    assert(top(1) === 1L, s"self must rank first: $top")
    assert(top(2) === 2L)
    assert(top(3) === 3L, s"zero vector must rank last with score 0: $top")
  }

  test("corrupt embeddings (NaN/Inf components) score 0 and rank last, never first (r19)") {
    // the zero-vector guard one step removed: denom === 0 is FALSE for
    // a NaN/Inf denom, so pre-fix a single corrupt vector scored NaN
    // and outranked every genuine neighbor for EVERY query (NaN is the
    // largest double under desc). At 100 TB corrupt embeddings exist.
    val session = SparkSpec.spark
    import session.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(Float.NaN, 1.0f, 0.0f)),              // NaN component
      (4L, Array(Float.PositiveInfinity, 0.0f, 0.0f)), // Inf component
      (5L, Array(0.5f, 0.5f, Float.NegativeInfinity))) // -Inf component
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 1L)
    val top = graft.text.Ann.cosineTopK(q, vecs, k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(top.head._2 === 1L, s"self must rank first: ${top.toSeq}")
    assert(top(1)._2 === 2L, s"finite neighbor second: ${top.toSeq}")
    // the three corrupt rows fill the tail with exact-zero scores
    val tail = top.drop(2)
    assert(tail.map(_._2).toSet === Set(3L, 4L, 5L), s"corrupt last: ${top.toSeq}")
    assert(tail.forall(_._3 === 0.0), s"corrupt scores must be 0: ${top.toSeq}")
    // near-dup path: degenerate vectors (corrupt AND zero — they all
    // land in LSH bucket t:0 and are pre-filtered before banding, the
    // blank-document minhash blowup in vector form) must pair with
    // NOTHING, while the genuine pair still surfaces
    val withZero = vecs.unionByName(
      Seq((6L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val dup = graft.text.Ann.cosineNearDuplicates(withZero, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dup === Set((1L, 2L)), s"only the genuine pair may surface: $dup")
  }

  test("language detection heuristic on real sentences") {
    assert(TextStats.detectLanguage("the cat sat on the mat and it was happy") === "en")
    assert(TextStats.detectLanguage("der Hund und die Katze sind nicht im Haus") === "de")
    assert(TextStats.detectLanguage("le chat est dans la maison et il dort pas") === "fr")
    assert(TextStats.detectLanguage("el perro no es como los gatos del parque") === "es")
    assert(TextStats.detectLanguage("这是一个中文句子没有拉丁字母") === "zh")
    // Japanese mixes kanji with kana — the kana is what distinguishes it
    // from Chinese (which has none)
    assert(TextStats.detectLanguage("これは日本語の文章です") === "ja")
    assert(TextStats.detectLanguage("カタカナだけのテキスト") === "ja")
    assert(TextStats.detectLanguage("이것은 한국어 문장입니다") === "ko")
    assert(TextStats.detectLanguage("это предложение на русском языке") === "ru")
    assert(TextStats.detectLanguage("xyzzy plugh") === "unknown")
    assert(TextStats.detectLanguage("") === "unknown")
  }

  test("language detection: legacy/OCR block coverage (r17)") {
    // halfwidth katakana (U+FF66–FF9D) — OCR'd/legacy Japanese; lives in
    // HALFWIDTH_AND_FULLWIDTH_FORMS, not the KATAKANA block
    assert(TextStats.detectLanguage("ﾊﾝｶｸｶﾀｶﾅﾉﾃｷｽﾄﾃﾞｽ") === "ja")
    // ...mixed with kanji, the realistic OCR shape
    assert(TextStats.detectLanguage("日本語ﾃｷｽﾄの文章") === "ja")
    // fullwidth Latin shares that block and must NOT count as kana
    assert(TextStats.detectLanguage("ＡＢＣＤＥＦ ＧＨＩ") !== "ja")
    // compatibility jamo (U+3130–318F) — decomposed/legacy Korean
    assert(TextStats.detectLanguage("ㄱㄴㄷㄹㅁㅂㅅ ㅏㅑㅓㅕㅗㅛ") === "ko")
    // CJK Extension A (U+3400–4DBF) ideographs count as Chinese
    assert(TextStats.detectLanguage("㐀㐁㐂㐃㐄㐅㐆㐇") === "zh")
    // Ext-A kanji with kana still reads Japanese (kana precedence holds)
    assert(TextStats.detectLanguage("㐀㐁のテキストです") === "ja")
  }

  test("fingerprints: stable, whitespace-insensitive, edit-sensitive") {
    assert(TextStats.fingerprint("a  b\tc") === TextStats.fingerprint("a b c"))
    assert(TextStats.fingerprint("abc") !== TextStats.fingerprint("abd"))
    // null is 0, NOT the empty-text seed — the q29Sql replay pins the
    // same distinction (its pre-r18 null path collapsed to the seed)
    assert(TextStats.fingerprint(null) === 0L)
    assert(TextStats.fingerprint("") === 1125899906842597L)
    // winnowing sketches overlap heavily for near dups
    val s1 = TextStats.winnowingSketch("the quick brown fox jumps over the lazy dog").toSet
    val s3 = TextStats.winnowingSketch("the quick brown fox jumps over the lazy cat").toSet
    val overlap = s1.intersect(s3).size.toDouble / s1.union(s3).size
    assert(overlap > 0.5, s"winnowing overlap $overlap")
  }

  test("winnowing sketch: short-text branch goldens (q50 oracle edges)") {
    // The sf corpora contain no document whose normalized text is
    // shorter than ~35 chars, so q50's DuckDB replay never exercises
    // the <k fingerprint branch or the fewer-grams-than-window single
    // window there. These values were cross-verified three ways at
    // authoring time: this kernel, an independent arithmetic replica,
    // and the q50Sql transformation run in DuckDB on the same strings
    // (SURVEY round-17 log) — pinning them here keeps the kernel
    // honest against all three.
    assert(TextStats.winnowingSketch("") === Seq(1125899906842597L))
    assert(TextStats.winnowingSketch("ab!") === Seq(1081989810475738822L)) // norm "ab" < k
    assert(TextStats.winnowingSketch("abcd") === Seq(6774539739450120615L))
    assert(TextStats.winnowingSketch("abcde") === Seq(7096547112148671390L)) // exactly one gram
    assert(TextStats.winnowingSketch("abcdefg") === Seq(7096547112148671390L)) // 3 grams, 1 window
    assert(TextStats.winnowingSketch("abcdefghi") ===
      Seq(7096547112148671390L, 7096547112149625695L)) // 5 grams, 2 windows
    assert(TextStats.winnowingSketch("Héllo, W0rld!") ===
      Seq(7096547112155442955L, 7096547112159140099L)) // non-alnum stripped pre-hash
    assert(TextStats.winnowingSketch("aaaaaaaa") === Seq(7096547112148639580L)) // dedup to one
  }

  test("n-gram Jaccard short-text branches match the q27 SQL oracle's fallback") {
    // The sf corpora have no document under ~35 normalized chars, so
    // q27's corpus run never exercises wordShingles' empty-text and
    // fewer-than-k-tokens branches (or the SQL mirror of them). This
    // corpus does; the expected pair set below was verified against the
    // q27Sql gram/Jaccard derivation run in DuckDB on the same ten docs
    // at authoring time (SURVEY round-17 log): empty and whitespace-only
    // docs pair with NOTHING (no phantom shingle), short docs pair via
    // the whole-text shingle across case/whitespace variants, and a
    // 4-token/3-token pair lands exactly on the 0.5 threshold.
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, ""), (1L, "   "), (2L, "hello world"), (3L, "Hello   WORLD"),
      (4L, "hello world again"), (5L, "hello world again"),
      (6L, "x"), (7L, "x"), (8L, "a b c d"), (9L, "a b c")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardDuplicates(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs === Set((2L, 3L, 1.0), (4L, 5L, 1.0), (6L, 7L, 1.0), (8L, 9L, 0.5)))
  }

  test("simhash tokenless documents emit no pairs (q26 oracle's empty-doc policy)") {
    // Every tokenless document (empty, whitespace-only — including
    // tab-only, which a Spark trim() guard would MISS since trim strips
    // only spaces — and null text) hashes to the zero signature, so
    // without the \S filter every pair of them meets in every band and
    // returns Hamming 0: phantom near-dups between documents sharing no
    // content, and a divergence from the q26 SQL oracle, whose token
    // stream drops them (verified on this exact corpus in DuckDB at
    // authoring time — it emits only (4,5,0); SURVEY round-17 log).
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, Some("")), (1L, Some("   ")), (2L, Some("\t\t")), (3L, Option.empty[String]),
      (4L, Some("the quick brown fox")), (5L, Some("the quick brown fox")),
      (6L, Some("the quick brown wolf")), (7L, Some("totally different text here"))
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashDuplicates(corpus, "doc_id", "text", maxDistance = 3)
      .select("a", "b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((4L, 5L, 0)))
  }

  test("minhash + ngram tokenless/trailing-whitespace edge corpus matches the q25/q27 oracle") {
    // The minHash/n-gram twin of the simhash test above, on the same
    // tokenless shapes plus the two wordShingles traps the r17 simhash
    // fix predicted (SURVEY round-17/18 log):
    //  - tab/newline-only docs (2, 8): Spark trim strips only SPACES, so
    //    the pre-r18 length(trim)-based guard let them through and both
    //    engines shingled them to a single whitespace phantom — every
    //    pair of them met at jaccard 1.0 (the simhash zero-signature bug,
    //    verbatim, in the minhash/ngram path). With the rlike(\S) guard
    //    they shingle to NOTHING and pair with nothing.
    //  - a trailing-whitespace doc (9): Spark's split keeps trailing
    //    empty tokens, so "hello world\t" shingled to "hello world " and
    //    never matched its exact-modulo-whitespace twin (10); stripping
    //    trailing whitespace before the split pairs them at 1.0.
    // The expected set below is the q27Sql gram/Jaccard derivation run
    // in DuckDB on this exact corpus at authoring time: only (4,5,1.0)
    // and (9,10,1.0) — no pair touches a tokenless doc.
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, Some("")), (1L, Some("   ")), (2L, Some("\t\t")), (3L, Option.empty[String]),
      (4L, Some("the quick brown fox")), (5L, Some("the quick brown fox")),
      (6L, Some("the quick brown wolf")), (7L, Some("totally different text here")),
      (8L, Some("\n\t")), (9L, Some("hello world\t")), (10L, Some("hello world")),
      // r19: the LEADING mirror of doc 9 — Java regex split emits an
      // empty token at the leading edge too ("\thello world" splits as
      // ["","hello","world"] without the ^\s+ strip), so pre-r19 this
      // doc shingled to " hello world" and never matched 9/10.
      (11L, Some("\thello world"))
    ).toDF("doc_id", "text")
    val expected = Set((4L, 5L, 1.0), (9L, 10L, 1.0), (9L, 11L, 1.0), (10L, 11L, 1.0))
    // q25's production parameters: identical docs agree on every band,
    // so LSH surfaces the complete >=0.5 exact-Jaccard set here
    val mh = Dedup.minHashDuplicates(corpus, "doc_id", "text",
      Dedup.MinHashConfig(shingleSize = 3, numPerm = 64, bands = 16, jaccardThreshold = 0.5))
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mh === expected, s"minhash: $mh")
    // same wordShingles base feeds the inverted-index path (q27)
    val ng = Dedup.ngramJaccardDuplicates(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ng === expected, s"ngram: $ng")
  }

  test("language detection through the registered detect_language UDF (r18)") {
    // The r17 block-coverage specs call TextStats.detectLanguage on the
    // driver JVM; this drives the same inputs through the REGISTERED UDF
    // on a DataFrame, covering serialization + executor evaluation of
    // the char-range branch table (halfwidth-katakana range guard
    // included) on the q29 call path.
    val s = spark
    import s.implicits._
    graft.functions.Udfs.register(s)
    val rows = Seq(
      (1L, "ﾊﾝｶｸｶﾀｶﾅﾉﾃｷｽﾄﾃﾞｽ", "ja"),         // halfwidth katakana
      (2L, "日本語ﾃｷｽﾄの文章", "ja"),            // mixed with kanji
      (3L, "ㄱㄴㄷㄹㅁㅂㅅ ㅏㅑㅓㅕㅗㅛ", "ko"),  // compatibility jamo
      (4L, "㐀㐁㐂㐃㐄㐅㐆㐇", "zh"),             // CJK Extension A
      (5L, "㐀㐁のテキストです", "ja"),           // Ext-A + kana precedence
      (6L, "the cat sat on the mat and it was happy", "en"),
      (7L, null.asInstanceOf[String], "unknown")
    ).toDF("id", "text", "expected")
    val got = rows.selectExpr("id", "detect_language(text) AS lang", "expected")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    for ((id, lang, exp) <- got) assert(lang === exp, s"row $id")
    // fullwidth Latin shares the halfwidth-katakana BLOCK and must not
    // read as kana through the UDF either
    val fw = Seq(Tuple1("ＡＢＣＤＥＦ ＧＨＩ")).toDF("text")
      .selectExpr("detect_language(text) AS lang").head().getString(0)
    assert(fw !== "ja")
  }

  test("exact cosine top-k: self is rank 1; scores ordered") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Ann.cosineTopK(vecs.filter(col("vec_id") === 0), vecs, 3).collect()
    assert(top.map(_.getAs[Long]("id")).toSeq === Seq(0L, 1L, 2L))
    assert(top.head.getAs[Double]("score") > 0.999999)
  }

  test("LSH cosine top-k achieves >=0.9 recall vs exact on the sf corpus") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val exact = Ann.cosineTopK(q, e, 5).select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshCosineTopK(q, e, 5).select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF cosine top-k: self always found, candidate set pruned") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val ivf = Ann.ivfCosineTopK(q, e, 5, Ann.IvfConfig(nList = 8, nProbe = 4))
      .collect()
    val byQuery = ivf.groupBy(_.getLong(0))
    // a query's own cell is always its top probe -> self is rank 1
    for ((qid, rows) <- byQuery)
      assert(rows.minBy(_.getInt(1)).getAs[Long]("id") === qid, s"self missing for $qid")
    // recall vs exact with half the cells probed
    val exact = Ann.cosineTopK(q, e, 5).select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ivf.map(r => (r.getLong(0), r.getAs[Long]("id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("cosine near-duplicate detection finds injected duplicate vectors") {
    val e = graft.core.Tables.embeddings(spark, sf).limit(100)
    val dupes = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.unionByName(dupes)
    val pairs = Ann.cosineNearDuplicates(corpus, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until 5L)
      assert(pairs.contains((i, i + 1000)), s"dup pair $i missing")
  }

  test("multimodal features feed the ANN path: duplicate media are each other's top hits") {
    // the array<float> feature contract composes straight into cosine
    // top-k — the "embed media, search neighbors" pipeline end to end
    val payloads = (1L to 20L).map { i =>
      val body = Array.tabulate(512)(j => ((i * 31 + j * 7) % 251).toByte)
      (i, Multimodal.StubCodec.encodeHeader("image", "fakepng", 64, 64, 0L) ++ body)
    }
    val media = (payloads ++ payloads.take(3).map { case (i, b) => (i + 100, b) })
      .toDF("media_id", "content")
    val featured = media.select(col("media_id").as("vec_id"),
      Multimodal.extractFeaturesUdf(col("content")).as("embedding"))
    val top = Ann.cosineTopK(featured.filter(col("vec_id") > 100), featured, k = 2)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("id"))
    for (q <- Seq(101L, 102L, 103L)) {
      val hits = top.filter(_._1 == q).map(_._2).toSet
      assert(hits === Set(q, q - 100), s"dup pair for $q: $hits")
    }
  }

  test("multimodal stubs: header metadata, features, frame sampling") {
    val payload = Array.tabulate(256)(_.toByte)
    val img = Multimodal.StubCodec.encodeHeader("image", "fakepng", 640, 480, 0L) ++ payload
    val vid = Multimodal.StubCodec.encodeHeader("video", "fakemp4", 1920, 1080, 12000L) ++ payload
    val df = Seq((1L, img), (2L, vid)).toDF("media_id", "content")
    val meta = Multimodal.withMetadata(df, "content").select("media_id", "media_meta.*").collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(meta(1L).getAs[String]("media_type") === "image")
    assert(meta(1L).getAs[Int]("width") === 640)
    assert(meta(2L).getAs[Long]("duration_ms") === 12000L)
    // frame sampling: 256 bytes / 64 per frame = 4 chunks, stride 4 -> 1 frame
    val frames = Multimodal.sampleFrames(df, "content", stride = 4, frameSize = 64)
      .groupBy("media_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames(1L) === 1L)
    // features are a normalized histogram over payload bytes
    val feats = df.filter(col("media_id") === 1)
      .select(Multimodal.extractFeaturesUdf(col("content"))).head().getSeq[Float](0)
    assert(feats.length === 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-5)
  }

  test("ImageIoCodec: real PNG/BMP/GIF bytes decode to format, dims, and exact pixels") {
    import Multimodal.ImageIoCodec
    val png = ImageIoCodec.encodePng(13, 7, 42L)
    // actual PNG container, not the stub header
    assert(png.take(4).map(_ & 0xff).sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)))
    assert(ImageIoCodec.imageMetadata(png) === Some(("png", 13, 7)))
    // lossless round trip: decoded pixel sum equals the generator's closed form
    val expected = (for { y <- 0 until 7; x <- 0 until 13 }
      yield (31L * x + 17L * y + 42L) % 256).sum
    assert(ImageIoCodec.pixelLumaSum(png) === Some(expected))

    // other JDK-native containers decode through the same function
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (fmt <- Seq("bmp", "gif")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val meta = ImageIoCodec.imageMetadata(bos.toByteArray)
      assert(meta.map(t => (t._2, t._3)) === Some((13, 7)), s"format $fmt")
      assert(meta.get._1 === fmt)
    }
    // garbage and null bytes are None, not exceptions
    assert(ImageIoCodec.imageMetadata("not an image".getBytes) === None)
    assert(ImageIoCodec.imageMetadata(null) === None)
    assert(ImageIoCodec.pixelLumaSum("junk".getBytes) === None)

    // the decoder-swap contract: real bytes through the media_meta schema
    val df2 = Seq((1L, png)).toDF("media_id", "content")
    val m = Multimodal.withImageMetadata(df2, "content")
      .select("media_meta.*").head()
    assert(m.getAs[String]("media_type") === "image")
    assert(m.getAs[String]("format") === "png")
    assert(m.getAs[Int]("width") === 13 && m.getAs[Int]("height") === 7)
  }

  test("WavCodec: real WAV bytes decode to container metadata and exact samples") {
    import Multimodal.WavCodec
    val wav = WavCodec.encodeWav(321, 8000, 7L)
    // actual RIFF/WAVE container, not the stub header
    assert(new String(wav.take(4)) === "RIFF" && new String(wav.slice(8, 12)) === "WAVE")
    // header-only metadata through the real javax.sound.sampled parser
    assert(WavCodec.audioMetadata(wav) ===
      Some(("wave", 1, 8000, 321L, 321L * 1000 / 8000)))
    // lossless PCM round trip: decoded sample sum equals the closed form
    val expected = (0 until 321).map(i => (173L * i + 7L) % 4001 - 2000).sum
    assert(WavCodec.sampleSum(wav) === Some(expected))

    // another JDK-native container decodes through the same functions:
    // transcode the clip to AIFF (big-endian PCM) via javax.sound itself
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    assert(WavCodec.audioMetadata(aiff).map(t => (t._1, t._2, t._4)) ===
      Some(("aiff", 1, 321L)))
    assert(WavCodec.sampleSum(aiff) === Some(expected), "big-endian decode path")

    // garbage and null bytes are None, not exceptions
    assert(WavCodec.audioMetadata("not audio".getBytes) === None)
    assert(WavCodec.audioMetadata(null) === None)
    assert(WavCodec.sampleSum("junk".getBytes) === None)
    // a fmt chunk with sample rate 0 parses in the JDK but is corrupt
    // input → None, not a divide-by-zero from inside a UDF
    val zeroRate = wav.clone()
    for (i <- 24 until 32) zeroRate(i) = 0 // sample-rate + byte-rate fields
    assert(WavCodec.audioMetadata(zeroRate) === None)

    // the decoder-swap contract: real bytes through the media_meta schema
    val df3 = Seq((1L, wav)).toDF("media_id", "content")
    val a = Multimodal.withAudioMetadata(df3, "content").select("media_meta.*").head()
    assert(a.getAs[String]("media_type") === "audio")
    assert(a.getAs[String]("format") === "wave")
    assert(a.getAs[Int]("width") === 1)      // channels
    assert(a.getAs[Int]("height") === 8000)  // sample rate
    assert(a.getAs[Long]("duration_ms") === 321L * 1000 / 8000)
  }

  test("ImageIoCodec.resizeNearest: exact NN resample through real codec passes") {
    import Multimodal.ImageIoCodec
    val png = ImageIoCodec.encodePng(10, 8, 5L)
    // downscale: target (tx,ty) must read source (tx*10/4, ty*8/3)
    val down = ImageIoCodec.resizeNearest(png, 4, 3).get
    assert(ImageIoCodec.imageMetadata(down) === Some(("png", 4, 3)))
    val expectDown = (for { ty <- 0 until 3; tx <- 0 until 4 }
      yield (31L * (tx * 10 / 4) + 17L * (ty * 8 / 3) + 5L) % 256).sum
    assert(ImageIoCodec.pixelLumaSum(down) === Some(expectDown))
    // upscale replicates source pixels, same index rule
    val up = ImageIoCodec.resizeNearest(png, 20, 16).get
    val expectUp = (for { ty <- 0 until 16; tx <- 0 until 20 }
      yield (31L * (tx * 10 / 20) + 17L * (ty * 8 / 16) + 5L) % 256).sum
    assert(ImageIoCodec.pixelLumaSum(up) === Some(expectUp))
    // identity-size resize preserves every pixel
    val same = ImageIoCodec.resizeNearest(png, 10, 8).get
    assert(ImageIoCodec.pixelLumaSum(same) === ImageIoCodec.pixelLumaSum(png))
    // garbage/degenerate inputs are None, not exceptions
    assert(ImageIoCodec.resizeNearest("junk".getBytes, 4, 4) === None)
    assert(ImageIoCodec.resizeNearest(null, 4, 4) === None)
    assert(ImageIoCodec.resizeNearest(png, 0, 4) === None)
    // the TARGET shares the MaxDecodePixels ceiling: a hostile caller
    // dimension must refuse BEFORE allocating the output buffer (a
    // 100000x100000 TYPE_INT_RGB is ~40 GB + 10^10 setRGB calls) —
    // this returns None in microseconds or the guard is gone
    assert(ImageIoCodec.resizeNearest(png, 100000, 100000) === None)
    assert(ImageIoCodec.resizeNearest(png, 1, Int.MaxValue) === None)
  }

  test("ImageIoCodec.imageStats: integer-exact quality features off decoded pixels") {
    import Multimodal.ImageIoCodec
    val png = ImageIoCodec.encodePng(6, 4, 13L)
    // independent reference computation straight from the generator
    val vs = for { y <- 0 until 4; x <- 0 until 6 }
      yield ((31L * x + 17L * y + 13L) % 256).toInt
    assert(ImageIoCodec.imageStats(png) === Some((
      24L, vs.map(_.toLong).sum, vs.map(v => v.toLong * v).sum, vs.min, vs.max)))
    assert(ImageIoCodec.imageStats("junk".getBytes) === None)
    assert(ImageIoCodec.imageStats(null) === None)
  }

  test("ImageIoCodec: corrupt-but-recognized images are None on every decode path") {
    import Multimodal.ImageIoCodec
    // valid PNG signature + header, truncated body: ImageIO RECOGNIZES
    // the format (readers.hasNext is true) but read() throws IIOException
    // mid-decode — a per-row UDF must map that to None, not fail the job
    val png = ImageIoCodec.encodePng(40, 30, 11L)
    val truncated = png.take(60)
    assert(ImageIoCodec.pixelLumaSum(truncated) === None)
    assert(ImageIoCodec.imageStats(truncated) === None)
    assert(ImageIoCodec.resizeNearest(truncated, 4, 4) === None)
  }

  test("hostile-dimension image headers fail fast, before any pixel allocation") {
    import Multimodal.ImageIoCodec
    // decompression bomb: a few flipped IHDR bytes declare a ~2G-pixel
    // image; without the header-gated ceiling, ImageIO.read grinds for
    // minutes allocating gigabytes inside a per-row UDF (found by
    // mutation fuzzing). IHDR width lives at bytes 16-19 big-endian.
    val bomb = ImageIoCodec.encodePng(8, 6, 1L).clone()
    bomb(16) = 0x7f.toByte; bomb(17) = 0xff.toByte
    bomb(18) = 0xff.toByte; bomb(19) = 0xff.toByte
    val t0 = System.nanoTime()
    assert(ImageIoCodec.pixelLumaSum(bomb) === None)
    assert(ImageIoCodec.imageStats(bomb) === None)
    assert(ImageIoCodec.resizeNearest(bomb, 4, 4) === None)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "hostile header must fail fast")
    // the ceiling gates FULL decodes only - header-only metadata on a
    // huge-but-wellformed declaration still reports (or rejects) cheaply
    assert(ImageIoCodec.imageMetadata(bomb).forall(_._2 > 0))
  }

  test("WavCodec: fractional AIFF sample rate is None, not a divide-by-zero") {
    import Multimodal.WavCodec
    // AIFF's COMM rate is an 80-bit extended FLOAT: a crafted 0.5 Hz
    // passes a `> 0` float check but truncates to 0 in integer division
    // — the metadata and resample paths must reject rate < 1 up front
    val bb = java.nio.ByteBuffer.allocate(12 + 26 + 24) // big-endian by default
    bb.put("FORM".getBytes, 0, 4); bb.putInt(8 + 26 + 24); bb.put("AIFF".getBytes, 0, 4)
    bb.put("COMM".getBytes, 0, 4); bb.putInt(18)
    bb.putShort(1)     // channels
    bb.putInt(4)       // numSampleFrames
    bb.putShort(16)    // bits
    // extended-precision 0.5: sign 0, exponent 16382, mantissa msb set
    bb.putShort(0x3FFE.toShort); bb.putLong(0x8000000000000000L)
    bb.put("SSND".getBytes, 0, 4); bb.putInt(16)
    bb.putInt(0); bb.putInt(0) // offset, block size
    for (i <- 0 until 4) bb.putShort((i * 50).toShort)
    val aiff = bb.array()
    assert(WavCodec.audioMetadata(aiff) === None)
    assert(WavCodec.resampleNearest(aiff, 5000) === None)
  }

  test("WavCodec: corrupt channel count is None, not a hang or a silent empty decode") {
    import Multimodal.WavCodec
    // channels=0 gives the stream a degenerate frame size, putting
    // AudioInputStream.read into its 0-return mode (0 is not EOF; EOF is
    // -1) — readAllBytes spins forever on that (the mutation-fuzz hang),
    // and the bounded replacement must report corrupt framing as None,
    // not accept an empty/truncated sample array as a valid silent clip
    val wav = WavCodec.encodeWav(200, 8000, 5L).clone()
    wav(22) = 0x00; wav(23) = 0x00 // channels -> 0, little-endian
    assert(WavCodec.sampleSum(wav) === None)
    assert(WavCodec.audioStats(wav) === None)
    assert(WavCodec.audioMetadata(wav) === None)
  }

  test("WavCodec.audioMetadata: unknown-length streaming container is None, not n_frames=-1") {
    import Multimodal.WavCodec
    // AU container with data size 0xFFFFFFFF (the spec's "unknown length"
    // streaming marker): the JDK parses it fine but reports frame length
    // NOT_SPECIFIED (-1), which must not leak out as apparently-valid
    // metadata with n_frames=-1 and a negative duration
    val bb = java.nio.ByteBuffer.allocate(24 + 16)
    bb.put(".snd".getBytes, 0, 4)
    bb.putInt(24)          // data offset
    bb.putInt(0xFFFFFFFF)  // data size unknown (streaming)
    bb.putInt(3)           // 16-bit linear PCM
    bb.putInt(8000)        // sample rate
    bb.putInt(1)           // channels
    var i = 0
    while (i < 8) { bb.putShort((i * 100).toShort); i += 1 }
    val au = bb.array()
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(au))
    assert(aff.getFrameLength < 0, "precondition: JDK reports NOT_SPECIFIED")
    assert(WavCodec.audioMetadata(au) === None)
  }

  test("WavCodec.resampleNearest: exact NN rate conversion through real codec passes") {
    import Multimodal.WavCodec
    val wav = WavCodec.encodeWav(80, 8000, 9L)
    def gen(i: Int): Long = (173L * i + 9L) % 4001 - 2000
    // downsample 8000 -> 5000: 50 samples, output j reads source j*8/5
    val down = WavCodec.resampleNearest(wav, 5000).get
    assert(WavCodec.audioMetadata(down) === Some(("wave", 1, 5000, 50L, 10L)))
    assert(WavCodec.sampleSum(down) ===
      Some((0 until 50).map(j => gen(j * 8000 / 5000)).sum))
    // upsample 8000 -> 16000 duplicates every sample
    val up = WavCodec.resampleNearest(wav, 16000).get
    assert(WavCodec.audioMetadata(up).map(m => (m._3, m._4)) === Some((16000, 160L)))
    assert(WavCodec.sampleSum(up) === WavCodec.sampleSum(wav).map(_ * 2))
    // identity rate preserves the stream exactly
    assert(WavCodec.sampleSum(WavCodec.resampleNearest(wav, 8000).get) ===
      WavCodec.sampleSum(wav))
    // degenerate/garbage inputs are None, not exceptions
    assert(WavCodec.resampleNearest(wav, 0) === None)
    assert(WavCodec.resampleNearest("junk".getBytes, 5000) === None)
    assert(WavCodec.resampleNearest(null, 5000) === None)
  }

  test("WavCodec.audioStats: integer-exact quality features off decoded PCM") {
    import Multimodal.WavCodec
    val wav = WavCodec.encodeWav(200, 8000, 3L)
    // independent reference computation straight from the generator
    val xs = (0 until 200).map(i => ((173L * i + 3L) % 4001 - 2000).toInt)
    val zc = xs.sliding(2).count { case Seq(a, b) => a * b < 0 }
    assert(WavCodec.audioStats(wav) === Some((
      200L, xs.map(_.toLong).sum, xs.map(v => v.toLong * v).sum,
      zc.toLong, xs.map(math.abs).max)))
    // single-sample clip: no pairs, so no crossings
    assert(WavCodec.audioStats(WavCodec.encodeWav(1, 8000, 5L)).map(_._4) === Some(0L))
    assert(WavCodec.audioStats("junk".getBytes) === None)
    assert(WavCodec.audioStats(null) === None)
  }

  test("AviCodec: real RIFF/AVI round trip, frame decode, stride sampling") {
    import Multimodal.{AviCodec, ImageIoCodec}
    val clip = AviCodec.encodeAviPngSeq(9, 5, 4, 40L, 11L)
    // the container is a real RIFF/AVI byte stream, not a stub header
    assert(new String(clip.take(4)) === "RIFF" && new String(clip.slice(8, 12)) === "AVI ")
    // header-only metadata straight from avih/strh
    assert(AviCodec.aviMetadata(clip) === Some(("mpng", 9, 5, 4L, 160L)))
    val frames = AviCodec.extractFrames(clip)
    assert(frames.length === 4)
    for (t <- 0 until 4) {
      assert(ImageIoCodec.imageMetadata(frames(t)) === Some(("png", 9, 5)))
      val expected = (for { y <- 0 until 5; x <- 0 until 9 }
        yield (31L * x + 17L * y + 11L + 97L * t) % 256).sum
      assert(ImageIoCodec.pixelLumaSum(frames(t)) === Some(expected), s"frame $t")
    }
    // garbage / null / truncated input → empty, not exceptions; the
    // contract is all-or-nothing, never a silently shorter clip
    assert(AviCodec.extractFrames("junk".getBytes) === Seq.empty)
    assert(AviCodec.extractFrames(null) === Seq.empty)
    assert(AviCodec.extractFrames(clip.dropRight(3)) === Seq.empty)
    assert(AviCodec.aviMetadata(clip.take(40)) === None)
    assert(AviCodec.aviMetadata("junk".getBytes) === None)
    assert(AviCodec.aviMetadata(null) === None)

    // stride sampling keeps original frame indices on the exploded rows
    val df4 = Seq((1L, clip)).toDF("media_id", "content")
    val sampled = Multimodal.sampleAviFrames(df4, "content", stride = 2)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(sampled.sameElements(Array(0, 2)))
  }

  test("AviCodec: MJPEG layout — JPEG payloads survive the container bit-exact") {
    import Multimodal.{AviCodec, ImageIoCodec}
    // real JPEG frames (lossy codec, so the pin is CONTAINER fidelity:
    // demuxed payloads must be byte-identical to what was muxed, and
    // each must decode through the real javax.imageio JPEG path)
    val jpegs = (0 until 3).map { t =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ImageIoCodec.encodePng(16, 12, 7L + t)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val avi = AviCodec.encodeAvi(jpegs, 16, 12, 33L, "MJPG")
    assert(AviCodec.aviMetadata(avi) === Some(("mjpg", 16, 12, 3L, 99L)))
    val out = AviCodec.extractFrames(avi)
    assert(out.length === 3)
    for (t <- 0 until 3) {
      assert(out(t).sameElements(jpegs(t)), s"frame $t bytes changed in transit")
      assert(ImageIoCodec.imageMetadata(out(t)) === Some(("jpeg", 16, 12)))
    }
    // odd-length payloads exercise RIFF even-padding on every boundary
    val odd = Seq(Array[Byte](1), Array[Byte](2, 3, 4), Array[Byte](5, 6, 7, 8, 9))
    val oddAvi = AviCodec.encodeAvi(odd, 2, 2, 40L, "MJPG")
    val oddOut = AviCodec.extractFrames(oddAvi)
    assert(oddOut.length === 3)
    for (t <- 0 until 3) assert(oddOut(t).sameElements(odd(t)), s"odd frame $t")
  }

  test("AviCodec: hostile and malformed containers are empty, never a crash or overrun") {
    import Multimodal.AviCodec
    val clip = AviCodec.encodeAviPngSeq(6, 4, 2, 40L, 3L)
    // hostile chunk size near u32 max: must compare as unsigned in Long
    // arithmetic, not wrap negative past the bounds check into a ~4GB copy
    def withChunkSize(src: Array[Byte], at: Int, size: Long): Array[Byte] = {
      val b = src.clone()
      b(at) = (size & 0xff).toByte; b(at + 1) = ((size >> 8) & 0xff).toByte
      b(at + 2) = ((size >> 16) & 0xff).toByte; b(at + 3) = ((size >> 24) & 0xff).toByte
      b
    }
    // find the movi list and poison its first frame chunk's size field
    val moviAt = clip.sliding(4).indexWhere(_.sameElements("movi".getBytes))
    assert(moviAt > 0, "precondition: movi present")
    val frameSizeAt = moviAt + 4 + 4 // movi fourcc, then 00dc fourcc, then size
    assert(AviCodec.extractFrames(withChunkSize(clip, frameSizeAt, 0xFFFFFFFFL)) === Seq.empty)
    assert(AviCodec.extractFrames(withChunkSize(clip, frameSizeAt, 0x7FFFFFFFL)) === Seq.empty)
    // a RIFF size overrunning the actual byte count = truncated container
    assert(AviCodec.extractFrames(withChunkSize(clip, 4, clip.length.toLong)) === Seq.empty)
    // truncation INSIDE a chunk header (mid size field) is all-or-nothing
    assert(AviCodec.extractFrames(
      withChunkSize(clip.take(moviAt + 10), 4, (moviAt + 2).toLong)) === Seq.empty)
    // frames grouped in a 'rec ' list (real multiplexers do this) demux too
    val frames = AviCodec.extractFrames(clip)
    val rec = {
      // rebuild: movi containing one rec list with both frames
      val inner = frames.map { f =>
        val bb = java.nio.ByteBuffer.allocate(8 + f.length + (f.length & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("00dc".getBytes, 0, 4); bb.putInt(f.length); bb.put(f); bb.array()
      }
      val recBody = inner.flatten.toArray
      val recList = {
        val bb = java.nio.ByteBuffer.allocate(12 + recBody.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("LIST".getBytes, 0, 4); bb.putInt(4 + recBody.length)
        bb.put("rec ".getBytes, 0, 4); bb.put(recBody); bb.array()
      }
      val movi = {
        val bb = java.nio.ByteBuffer.allocate(12 + recList.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("LIST".getBytes, 0, 4); bb.putInt(4 + recList.length)
        bb.put("movi".getBytes, 0, 4); bb.put(recList); bb.array()
      }
      val bb = java.nio.ByteBuffer.allocate(12 + movi.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes, 0, 4); bb.putInt(4 + movi.length)
      bb.put("AVI ".getBytes, 0, 4); bb.put(movi); bb.array()
    }
    val recOut = AviCodec.extractFrames(rec)
    assert(recOut.length === frames.length)
    for (t <- frames.indices) assert(recOut(t).sameElements(frames(t)), s"rec frame $t")

    // hostile avih values: u32-max microSecPerFrame x u32-max frames
    // multiplies past Long.MaxValue — must be None, not a negative
    // duration presented as valid metadata (avih body starts at 32;
    // usPerFrame at +0, totalFrames at +16)
    val bomb = clip.clone()
    for (off <- Seq(32, 48); k <- 0 until 4) bomb(off + k) = 0xff.toByte
    assert(AviCodec.aviMetadata(bomb) === None)

    // the handler must come from the VIDEO stream's strh: with the only
    // strl re-typed 'auds' there is no vids stream to report
    val audsOnly = clip.clone()
    System.arraycopy("auds".getBytes, 0, audsOnly, 108, 4) // strh fccType
    assert(AviCodec.aviMetadata(audsOnly) === None)
    // frames still demux fine - metadata strictness is about labeling,
    // not about refusing the container
    assert(AviCodec.extractFrames(audsOnly).length === 2)

    // an EXTENDED avih (declared size > 56) must still parse: the size
    // field exists precisely so writers can grow the header, and the
    // strl scan must start after the declared size, not after 56
    val le = (n: Int) => { val b = java.nio.ByteBuffer.allocate(n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN); b }
    def chunkB(id: String, body: Array[Byte]): Array[Byte] = {
      val b = le(8 + body.length + (body.length & 1))
      b.put(id.getBytes, 0, 4); b.putInt(body.length); b.put(body); b.array()
    }
    val avih64 = clip.slice(32, 88) ++ Array.fill(8)(0.toByte) // +8 reserved-ish bytes
    val strl = clip.slice(88, 212)                             // the whole LIST strl verbatim
    val hdrlBody = chunkB("avih", avih64) ++ strl
    val hdrl = {
      val b = le(12 + hdrlBody.length)
      b.put("LIST".getBytes, 0, 4); b.putInt(4 + hdrlBody.length)
      b.put("hdrl".getBytes, 0, 4); b.put(hdrlBody); b.array()
    }
    val extRiff = {
      val b = le(12 + hdrl.length)
      b.put("RIFF".getBytes, 0, 4); b.putInt(4 + hdrl.length)
      b.put("AVI ".getBytes, 0, 4); b.put(hdrl); b.array()
    }
    assert(AviCodec.aviMetadata(extRiff) === Some(("mpng", 6, 4, 2L, 80L)))

    // a crafted thousands-deep rec-list chain must hit the depth cap and
    // return empty, not overflow the stack in a per-row UDF
    val deep = {
      val levels = 5000
      val innermost = Array.empty[Byte]
      val body = (1 to levels).foldLeft(innermost) { (inner, _) =>
        val bb = java.nio.ByteBuffer.allocate(12 + inner.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("LIST".getBytes, 0, 4); bb.putInt(4 + inner.length)
        bb.put("rec ".getBytes, 0, 4); bb.put(inner); bb.array()
      }
      val movi = {
        val bb = java.nio.ByteBuffer.allocate(12 + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("LIST".getBytes, 0, 4); bb.putInt(4 + body.length)
        bb.put("movi".getBytes, 0, 4); bb.put(body); bb.array()
      }
      val bb = java.nio.ByteBuffer.allocate(12 + movi.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes, 0, 4); bb.putInt(4 + movi.length)
      bb.put("AVI ".getBytes, 0, 4); bb.put(movi); bb.array()
    }
    assert(AviCodec.extractFrames(deep) === Seq.empty)
  }

  test("AviCodec: decimal stream numbers demux; multi-video-stream and hostile geometry rejected") {
    import Multimodal.AviCodec
    def le(n: Int) = java.nio.ByteBuffer.allocate(n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = le(8 + body.length + (body.length & 1))
      b.put(id.getBytes, 0, 4); b.putInt(body.length); b.put(body); b.array()
    }
    def riffMovi(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val movi = {
        val b = le(12 + body.length)
        b.put("LIST".getBytes, 0, 4); b.putInt(4 + body.length)
        b.put("movi".getBytes, 0, 4); b.put(body); b.array()
      }
      val b = le(12 + movi.length)
      b.put("RIFF".getBytes, 0, 4); b.putInt(4 + movi.length)
      b.put("AVI ".getBytes, 0, 4); b.put(movi); b.array()
    }
    // AVI stream numbers are two DECIMAL digits (MAKEAVICKID / ffmpeg
    // write '0'+n/10, '0'+n%10): stream 10's chunks are '10dc' and must
    // demux
    val f10 = Array[Byte](1, 2, 3)
    val tenStream = riffMovi(chunk("10dc", f10))
    val tenOut = AviCodec.extractFrames(tenStream)
    assert(tenOut.length === 1)
    assert(tenOut.head.sameElements(f10))
    // a nonstandard hex-looking id ('0Adc') is skipped like any
    // non-video chunk — it must NOT count as a second stream and void
    // the file's valid 00dc frames through the all-or-nothing rule
    val strayHex = riffMovi(chunk("00dc", f10), chunk("0Adc", Array[Byte](7)))
    val strayOut = AviCodec.extractFrames(strayHex)
    assert(strayOut.length === 1)
    assert(strayOut.head.sameElements(f10))
    // video chunks across TWO streams: all-or-nothing reject, never a
    // merged frame sequence from both
    val twoStreams = riffMovi(chunk("00dc", Array[Byte](1)), chunk("01dc", Array[Byte](2)))
    assert(AviCodec.extractFrames(twoStreams) === Seq.empty)
    // audio chunks of OTHER streams do not trip the single-stream rule
    val withAudio = riffMovi(chunk("00dc", f10), chunk("01wb", Array[Byte](9, 9)))
    assert(AviCodec.extractFrames(withAudio).length === 1)

    // hostile avih geometry: u32 width past Int.MaxValue (or a zero
    // dimension) is a corrupt header -> None, same policy as the
    // duration overflow (avih body at 32: width +32, height +36)
    val clip = AviCodec.encodeAviPngSeq(6, 4, 2, 40L, 3L)
    val wideW = clip.clone()
    for (k <- 0 until 4) wideW(64 + k) = 0xff.toByte
    assert(AviCodec.aviMetadata(wideW) === None)
    val zeroH = clip.clone()
    for (k <- 0 until 4) zeroH(68 + k) = 0.toByte
    assert(AviCodec.aviMetadata(zeroH) === None)
  }
}
