package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.{Ann, Dedup, TextStats}

/** LLM-training-data operators over the `documents` / `embeddings`
  * corpus: dedup (exact / MinHash / SimHash / n-gram Jaccard), similarity
  * search, and text analysis.
  */
object LlmData {

  /** JAVA's \s character class spelled out for the DuckDB oracle SQL —
    * RE2's \s lacks \x0b (VT), so a literal '\s' in an oracle regex
    * diverges from the Spark kernel's Java semantics on VT text (the
    * r19 hostile_diff find). ONE definition; oracle SQL references it
    * via the <WS> placeholder so a retyped literal can never silently
    * drop a member of the class.
    */
  private val JavaWs = """[ \t\n\x0b\f\r]"""
  private def withJavaWs(sql: String): String = sql.replace("<WS>", JavaWs)



  /** `documents` spread to full width (r21): bench-SF parquet is a
    * single row group, so the per-row encode/decode kernels of the
    * media/text queries otherwise run on ONE task — and the final
    * orderBy's range-sampling pass re-executes the whole chain a second
    * time (the exchange below the kernels is materialized once by AQE,
    * so the sample pass re-reads the shuffle instead).
    */
  private def docsWide(spark: SparkSession, dir: String): DataFrame =
    graft.core.Parallelism.staged(Tables.documents(spark, dir), col("doc_id"))

  /** Documents with injected duplicates: every doc_id divisible by 5 gets
    * a verbatim copy (id + 100000), every doc_id divisible by 7 gets a
    * near-copy with a token appended (id + 200000). Deterministic, and
    * reproducible in SQL for the oracle.
    */
  private def corpusWithDups(spark: SparkSession, dir: String): DataFrame = {
    // demo corpus capped at 2500 docs (ScaleKnob.docsCap — the Bench
    // scaling pass lifts it to 5000 to measure growth): covers every row
    // at the sf0.01 correctness scale (500 docs); bounds the bench-scale
    // quadratic worst case of this deliberately tiny-vocabulary corpus
    val d = Tables.documents(spark, dir).select("doc_id", "text")
      .filter(col("doc_id") < graft.core.ScaleKnob.docsCap)
    val exact = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val near = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" appended tail token")).as("text"))
    // duplicates are injected BEFORE ScaleKnob.sample (the q35
    // precedent): under bench replication the injected ids are
    // shard-remapped (id·n+k) with every other id — so +100000 can
    // never collide with a replicated real id (the scaling pass's
    // lifted docsCap of 5000 times the factor cap of 26 reaches
    // 130000) — and the near-copy's appended
    // tail is Caesar-rotated per shard with the rest of the text,
    // keeping cross-shard shingles/grams disjoint instead of sharing
    // one literal unrotated token across all shards. Under
    // frac-sampling the order is equivalent: +100000/+200000 preserve
    // doc_id mod 1000, so a duplicate survives iff its base row does.
    graft.core.ScaleKnob.sample(
      d.unionByName(exact).unionByName(near), "doc_id")
      // one parquet split per union branch at bench SFs (single row
      // group): without this the shingle/minhash/simhash kernels of
      // q24–q27 run on 3 tasks — same spread-the-kernels pattern as
      // q52–q64
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
  }

  /** Exact dedup over the duplicated corpus — md5 content groups. The
    * oracle recomputes the same construction + grouping in SQL (DuckDB
    * and Spark agree on md5 hex).
    */
  private def q24(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(corpusWithDups(spark, dir), "doc_id", "text")
      .filter(col("group_size") > 1)
      .select(col("content_hash"), col("group_size"), col("canonical_id"))
      .orderBy(col("canonical_id"))
  private val q24Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 2500
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0 AND doc_id < 2500
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' appended tail token' FROM documents WHERE doc_id % 7 = 0 AND doc_id < 2500)
      |SELECT md5(text) AS content_hash, COUNT(*) AS group_size,
      |  MIN(doc_id) AS canonical_id
      |FROM corpus
      |GROUP BY 1
      |HAVING COUNT(*) > 1
      |ORDER BY canonical_id""".stripMargin

  /** MinHash+LSH near-dup detection: must find the near-copies (high
    * shingle overlap) as well as the exact copies. The pipeline rescores
    * every banded candidate with EXACT shingle Jaccard, so its output is
    * the subset of the true ≥-threshold pair set that LSH surfaces — and
    * on this corpus (64 perms × 16 bands at the pairs' Jaccard levels)
    * that is the COMPLETE set, deterministically (fixed hash seeds). The
    * oracle is therefore the same first-principles SQL Jaccard derivation
    * q27 uses: any LSH recall miss or banding bug breaks the hash match.
    */
  private def q25(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashDuplicates(corpusWithDups(spark, dir), "doc_id", "text",
      Dedup.MinHashConfig(shingleSize = 3, numPerm = 64, bands = 16, jaccardThreshold = 0.5))
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy(col("a"), col("b"))

  /** SimHash near-dup pairs (Hamming ≤ 3 on 64-bit signatures). The
    * token hash is md5-based ([[graft.text.Dedup.tokenHash64]]) precisely
    * so DuckDB can rebuild the signatures bit by bit from `md5(token)`
    * hex and verify the whole pipeline — tokenization, weighted bit
    * votes, and the pigeonhole band join (exact for Hamming ≤ 3, so the
    * SQL's all-pairs Hamming filter is the same set).
    */
  private def q26(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashDuplicates(corpusWithDups(spark, dir), "doc_id", "text", maxDistance = 3)
      .orderBy(col("a"), col("b"))
  private val q26Sql =
    withJavaWs("""WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 2500
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0 AND doc_id < 2500
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' appended tail token' FROM documents WHERE doc_id % 7 = 0 AND doc_id < 2500),
      |toks AS (
      |  -- <WS> = JAVA's \s, spelled out: RE2's \s lacks
      |  -- \x0b (VT), so '\s+' here would mint a token the Spark kernel
      |  -- treats as whitespace (hostile_diff.py finding, r19)
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '<WS>+')) AS tok FROM corpus),
      |hashed AS (SELECT doc_id, md5(tok) AS h FROM toks WHERE tok <> ''),
      |bits AS (
      |  SELECT doc_id, i,
      |    CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - (i // 4), 1)) - 1)
      |               >> (i % 4)) & 1 = 1 THEN 1 ELSE -1 END AS w
      |  FROM hashed, (SELECT unnest(generate_series(0, 63)) AS i)),
      |sig AS (
      |  SELECT doc_id, i, CASE WHEN SUM(w) > 0 THEN 1 ELSE 0 END AS bit
      |  FROM bits GROUP BY 1, 2),
      |ham AS (
      |  SELECT sa.doc_id AS a, sb.doc_id AS b,
      |    SUM(CASE WHEN sa.bit <> sb.bit THEN 1 ELSE 0 END) AS hamming
      |  FROM sig sa JOIN sig sb ON sa.i = sb.i AND sa.doc_id < sb.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b, CAST(hamming AS INTEGER) AS hamming FROM ham
      |WHERE hamming <= 3
      |ORDER BY a, b""".stripMargin)

  /** N-gram Jaccard dedup via the inverted-index join. The oracle
    * recomputes 3-token-shingle Jaccard in SQL from first principles —
    * an independent (and differently-shaped) derivation of the same
    * math, cross-checking the shingle construction and the join.
    */
  private def q27(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardDuplicates(corpusWithDups(spark, dir), "doc_id", "text",
      k = 3, threshold = 0.5)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy(col("a"), col("b"))
  private val q27Sql =
    withJavaWs("""WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 2500
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0 AND doc_id < 2500
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' appended tail token' FROM documents WHERE doc_id % 7 = 0 AND doc_id < 2500),
      |toks AS (
      |  -- mirrors wordShingles' normalization exactly: tokenless docs
      |  -- (no \S char) produce NO tokens, and whitespace is stripped
      |  -- from BOTH edges before the split so it cannot become an edge
      |  -- empty token (string_split_regex emits leading/trailing
      |  -- empties, as does Spark's split; 'g' flag so the alternation
      |  -- hits both edges). <WS> = JAVA's \s spelled out:
      |  -- RE2's \s lacks \x0b, so a VT-only document would read as a
      |  -- token here while the kernel sees whitespace (hostile_diff.py)
      |  SELECT doc_id,
      |    string_split_regex(regexp_replace(lower(text), '^<WS>+|<WS>+$', '', 'g'), '<WS>+') AS t
      |  FROM corpus WHERE regexp_matches(text, '[^ \t\n\x0b\f\r]')),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)
      |  UNION
      |  -- short-text fallback, mirroring wordShingles: fewer than k
      |  -- tokens (but nonempty) shingles as the whole text; empty text
      |  -- shingles as nothing
      |  SELECT doc_id, array_to_string(t, ' ') AS g FROM toks
      |  WHERE len(t) < 3 AND array_to_string(t, ' ') <> ''),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
      |pairs AS (
      |  SELECT g1.doc_id AS a, g2.doc_id AS b, COUNT(*) AS shared
      |  FROM grams g1 JOIN grams g2 USING (g)
      |  WHERE g1.doc_id < g2.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b,
      |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = a
      |JOIN sizes sb ON sb.doc_id = b
      |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5
      |ORDER BY a, b""".stripMargin)

  /** Text statistics with a DuckDB oracle: char count, whitespace token
    * count, digit ratio — independently derivable in SQL.
    */
  private def q28(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        round(TextStats.digitRatio(col("text")), 6).as("digit_ratio"))
      .orderBy(col("doc_id"))
  private val q28Sql =
    withJavaWs("""SELECT doc_id,
      |  length(text) AS n_chars,
      |  -- mirrors tokenCount's r19 rules: tokenless (no Java-\S char)
      |  -- is 0, both-edge whitespace stripped pre-split (both split
      |  -- functions emit leading/trailing empty tokens). The class
      |  -- <WS> is JAVA's \s spelled out — RE2's \s lacks
      |  -- \x0b (hostile_diff.py finding, r19)
      |  CASE WHEN NOT regexp_matches(text, '[^ \t\n\x0b\f\r]') THEN 0
      |       ELSE len(string_split_regex(regexp_replace(text, '^<WS>+|<WS>+$', '', 'g'), '<WS>+')) END AS n_tokens,
      |  -- empty-text guard mirrors charRatio's when(length===0, 0.0):
      |  -- without it DuckDB reads 0.0/0 = NaN where the kernel reads 0.0
      |  -- (hostile_diff.py finding, r19; latent on the non-empty corpus)
      |  CASE WHEN length(text) = 0 THEN 0.0
      |       ELSE round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text), 6) END AS digit_ratio
      |FROM documents
      |ORDER BY doc_id""".stripMargin)

  /** Language-ID heuristic + quality scoring + BPE-ish token counts +
    * Rabin–Karp fingerprint, all hash-verified against a full DuckDB
    * replay ([[q29Sql]]):
    *  - language-ID: replayed in FULL since r19 — the four script-block
    *    branches (ideograph/kana/Hangul/Cyrillic, incl. the halfwidth-
    *    katakana / compatibility-jamo / CJK-Ext-A extensions) as
    *    codepoint-range counts over the kernel's exact letter
    *    population (BMP-only, per-UTF-16-unit — astral letters count
    *    zero on both sides), then the stopword-profile counting and the
    *    maxBy `(count, lang)` tie-break verbatim. Exercised by
    *    hostile_diff.py's CJK/Hangul/Cyrillic/halfwidth shapes;
    *  - quality: the exact composite formula, term by term in double;
    *  - BPE count: the same pre-tokenizer regex via `regexp_extract_all`
    *    (Java and RE2 agree on every construct the pattern uses);
    *  - fingerprint: `list_reduce` over codepoints in HUGEINT mod 2^64,
    *    re-signed at the end — bit-for-bit the JVM's wrapping `31*h + c`.
    */
  private def q29(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id"),
        TextStats.detectLanguageUdf(col("text")).as("predicted_lang"),
        round(TextStats.qualityScore(col("text")), 6).as("quality"),
        TextStats.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        TextStats.fingerprintUdf(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  private val q29Sql =
    withJavaWs("""WITH m AS (
      |  SELECT doc_id, text,
      |    length(text) AS n,
      |    -- <WS> = Java's \s spelled out (RE2 \s lacks \x0b)
      |    string_split_regex(regexp_replace(lower(text), '^<WS>+|<WS>+$', '', 'g'), '<WS>+') AS toks,
      |    list_filter(string_split_regex(lower(text), '[^\p{L}]+'), x -> x <> '') AS ltoks,
      |    length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS n_alpha,
      |    length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
      |    -- fingerprint norm replays the JVM exactly: collapse JAVA-\s
      |    -- runs (not RE2 \s — no \x0b there), then strip the edges the
      |    -- way java.lang.String.trim does — EVERY char <= U+0020, NOT
      |    -- DuckDB trim, which is unicode-aware and also strips
      |    -- NBSP/U+3000 that the JVM keeps (hostile_diff.py finding)
      |    regexp_replace(regexp_replace(lower(text), '<WS>+', ' ', 'g'),
      |                   '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS norm,
      |    -- script-ID replay (r19): the kernel's letter loop walks
      |    -- UTF-16 units, so astral letters count ZERO (each surrogate
      |    -- fails isLetter) — replayed by dropping codepoints >= 0x10000
      |    -- before the \p{L} filter. Block ranges are the JDK's:
      |    -- CJK U+4E00-9FFF + ExtA U+3400-4DBF; hiragana U+3040-309F +
      |    -- katakana U+30A0-30FF + halfwidth-kana U+FF66-FF9D; Hangul
      |    -- syllables U+AC00-D7AF + jamo U+1100-11FF + compat jamo
      |    -- U+3130-318F; Cyrillic U+0400-04FF
      |    list_filter(list_transform(range(1, length(text) + 1), i -> unicode(text[i])),
      |                c -> c < 65536 AND regexp_matches(chr(c), '\p{L}')) AS lcp
      |  FROM documents
      |), counts AS (
      |  SELECT *,
      |    len(lcp) AS n_let,
      |    len(list_filter(lcp, c -> (c >= 19968 AND c <= 40959) OR (c >= 13312 AND c <= 19903))) AS n_ideo,
      |    len(list_filter(lcp, c -> (c >= 12352 AND c <= 12543) OR (c >= 65382 AND c <= 65437))) AS n_kana,
      |    len(list_filter(lcp, c -> (c >= 44032 AND c <= 55215) OR (c >= 4352 AND c <= 4607) OR (c >= 12592 AND c <= 12687))) AS n_hang,
      |    len(list_filter(lcp, c -> c >= 1024 AND c <= 1279)) AS n_cyr,
      |    CASE WHEN NOT regexp_matches(text, '[^ \t\n\x0b\f\r]') THEN 0 ELSE len(toks) END AS n_toks,
      |    len(list_distinct(toks)) AS n_distinct,
      |    len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','be','that','it','for','on','with','as'], x))) AS n_stop,
      |    len(list_filter(ltoks, x -> list_contains(['the','and','of','to','in','is','that','it','was','for','with','are'], x))) AS c_en,
      |    len(list_filter(ltoks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','eine','für','von','auf'], x))) AS c_de,
      |    len(list_filter(ltoks, x -> list_contains(['le','la','les','et','est','pas','pour','dans','une','que','des','du'], x))) AS c_fr,
      |    len(list_filter(ltoks, x -> list_contains(['el','los','las','es','no','por','para','una','con','del','se','como'], x))) AS c_es,
      |    len(list_filter(ltoks, x -> list_contains(['il','di','che','non','per','una','sono','con','del','gli','questo'], x))) AS c_it
      |  FROM m
      |), lang AS (
      |  -- maxBy (count, lang): langs tested in descending name order with
      |  -- `= greatest(...)` reproduces the lexicographic tie-break
      |  SELECT *, greatest(c_en, c_de, c_fr, c_es, c_it) AS mx,
      |    CASE WHEN c_it = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'it'
      |         WHEN c_fr = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'fr'
      |         WHEN c_es = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'es'
      |         WHEN c_en = greatest(c_en, c_de, c_fr, c_es, c_it) THEN 'en'
      |         ELSE 'de' END AS best_lang
      |  FROM counts
      |), fp AS (
      |  -- JVM wrapping arithmetic: fold 31*h + UTF-16 UNIT in HUGEINT
      |  -- mod 2^64 (seed prepended: list_reduce has no initial-value
      |  -- arg). The kernel's charAt loop walks UTF-16 code units, so an
      |  -- astral codepoint hashes as its SURROGATE PAIR — replayed here
      |  -- by expanding c >= 0x10000 into [0xD800 + ((c-0x10000) >> 10),
      |  -- 0xDC00 + ((c-0x10000) & 0x3FF)] before the fold (r19; a
      |  -- codepoint fold diverges on any emoji/astral text).
      |  -- NULL text is 0, the kernel's explicit null return — without
      |  -- the guard the NULL unit list collapses to the bare seed
      |  -- (empty text's legitimate value) instead of null-matching
      |  SELECT *, CASE WHEN text IS NULL THEN CAST(0 AS HUGEINT) ELSE list_reduce(
      |      list_prepend(CAST(1125899906842597 AS HUGEINT),
      |        flatten(list_transform(range(1, length(norm) + 1), i ->
      |          CASE WHEN unicode(norm[i]) < 65536
      |               THEN [CAST(unicode(norm[i]) AS HUGEINT)]
      |               ELSE [CAST(55296 + ((unicode(norm[i]) - 65536) // 1024) AS HUGEINT),
      |                     CAST(56320 + ((unicode(norm[i]) - 65536) % 1024) AS HUGEINT)]
      |          END))),
      |      (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) END AS fpu
      |  FROM lang
      |)
      |SELECT doc_id,
      |  -- full branch order of the kernel: null/empty -> no letters ->
      |  -- the four script thresholds -> stopword profiles. n_let (the
      |  -- kernel's per-unit letter count), NOT n_alpha (codepoint count
      |  -- incl. astral): the two differ on astral-letter text
      |  CASE WHEN text IS NULL OR n = 0 THEN 'unknown'
      |       WHEN n_let = 0 THEN 'unknown'
      |       WHEN CAST(n_kana AS DOUBLE) / n_let > 0.1 THEN 'ja'
      |       WHEN CAST(n_hang AS DOUBLE) / n_let > 0.3 THEN 'ko'
      |       WHEN CAST(n_ideo AS DOUBLE) / n_let > 0.3 THEN 'zh'
      |       WHEN CAST(n_cyr AS DOUBLE) / n_let > 0.3 THEN 'ru'
      |       WHEN len(ltoks) = 0 THEN 'unknown'
      |       WHEN mx >= 2 THEN best_lang ELSE 'unknown' END AS predicted_lang,
      |  round(
      |    least(n / 200.0, 1.0) * 0.2
      |    + (CASE WHEN n = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n END) * 0.3
      |    + least((CASE WHEN n_toks = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_toks END) * 4.0, 1.0) * 0.2
      |    + (CASE WHEN n_toks = 0 THEN 0.0 ELSE CAST(n_distinct AS DOUBLE) / n_toks END) * 0.15
      |    + (1.0 - least((CASE WHEN n = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n END) * 4.0, 1.0)) * 0.15,
      |    6) AS quality,
      |  -- the \s inside the BPE pre-tokenizer is spelled out as JAVA's
      |  -- class <WS>: RE2's \s lacks \x0b, which would split
      |  -- a VT+FF run into two pre-tokens where the kernel sees one
      |  -- whitespace run (hostile_diff.py finding, r19)
      |  len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\x0b\f\r\p{L}\p{N}]+|<WS>+')) AS n_bpe_tokens,
      |  CAST(CASE WHEN fpu >= CAST('9223372036854775808' AS HUGEINT)
      |       THEN fpu - CAST('18446744073709551616' AS HUGEINT) ELSE fpu END AS BIGINT) AS fingerprint
      |FROM fp
      |ORDER BY doc_id""".stripMargin)

  /** Winnowing document sketch (TextStats.winnowingSketch): per-doc
    * k-gram rolling hashes → per-window minimum → dedup. The full hash
    * SET per document is pinned order-independently by (size, XOR
    * checksum, min, max) — XOR because JVM long addition would overflow
    * under ANSI mode, and XOR over a DISTINCT set loses nothing —
    * against a DuckDB recomputation of the whole contract from first
    * principles (same HUGEINT mod-2^64 fold as [[q29Sql]]'s
    * fingerprint). A single changed, added or dropped hash anywhere in
    * the sketch breaks the checksum, so this oracles the rolling-hash
    * arithmetic, the window-min selection AND the dedup step, not just
    * sketch cardinality. Exploding the sketches instead would be ~2M
    * oracle rows at sf0.1 — needless gate weight for the same coverage.
    *
    * Correctness trap the replay must dodge: the window minimum compares
    * SIGNED longs on the JVM, so the SQL re-signs every gram hash
    * (HUGEINT → BIGINT two's complement) BEFORE `list_min`, not after —
    * an unsigned min diverges as soon as any window holds a hash with
    * the top bit set (~every window, for a 64-bit hash).
    */
  private def q50(spark: SparkSession, dir: String): DataFrame =
    docsWide(spark, dir)
      .select(col("doc_id"), TextStats.winnowingSketchUdf(col("text")).as("sketch"))
      .select(col("doc_id"),
        size(col("sketch")).cast("long").as("sketch_size"),
        aggregate(col("sketch"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("sketch_xor"),
        array_min(col("sketch")).as("sketch_min"),
        array_max(col("sketch")).as("sketch_max"))
      .orderBy(col("doc_id"))

  private val q50Sql =
    """WITH n AS (
      |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, norm, length(norm) AS ln FROM n
      |), grams AS (
      |  -- k=5 gram rolling hashes, JVM wrapping arithmetic (see q29's
      |  -- fingerprint note), re-signed to BIGINT IMMEDIATELY so the
      |  -- window minimum below compares signed longs like the JVM.
      |  -- NULL text (norm NULL) yields NO grams — the Scala kernel
      |  -- returns the empty sketch for null, and without this guard
      |  -- the SQL would null-propagate through length/range/list ops
      |  -- into NULL sketch stats instead of (0, 0, NULL, NULL)
      |  SELECT doc_id, CASE WHEN norm IS NULL THEN CAST([] AS BIGINT[]) ELSE list_transform(
      |    CASE WHEN ln < 5 THEN
      |      [list_reduce(
      |         list_prepend(CAST(1125899906842597 AS HUGEINT),
      |           list_transform(range(1, ln + 1), i -> CAST(unicode(norm[i]) AS HUGEINT))),
      |         (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT))]
      |    ELSE
      |      list_transform(range(1, ln - 3), i ->
      |        list_reduce(
      |          list_prepend(CAST(1125899906842597 AS HUGEINT),
      |            list_transform(range(i, i + 5), j -> CAST(unicode(norm[j]) AS HUGEINT))),
      |          (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)))
      |    END,
      |    h -> CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
      |         THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT)) END AS gs
      |  FROM g
      |), sk AS (
      |  -- window=4 sliding minimum then dedup; a gram list shorter than
      |  -- the window yields ONE window of all grams (Scala sliding(4));
      |  -- NO grams (null text) yields the EMPTY sketch, not [NULL]
      |  SELECT doc_id,
      |    CASE WHEN len(gs) = 0 THEN CAST([] AS BIGINT[]) ELSE
      |      list_distinct(list_transform(range(1, greatest(len(gs) - 3, 1) + 1),
      |        w -> list_min(gs[w:w+3]))) END AS sketch
      |  FROM grams
      |)
      |SELECT doc_id,
      |  CAST(len(sketch) AS BIGINT) AS sketch_size,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), sketch), (a, b) -> xor(a, b)) AS sketch_xor,
      |  list_min(sketch) AS sketch_min,
      |  list_max(sketch) AS sketch_max
      |FROM sk
      |ORDER BY doc_id""".stripMargin

  /** Exact cosine top-k: 10 probe vectors against the whole corpus.
    * Scores are floats through different summation orders in the two
    * engines, so the oracle compares the RANKING (query, rank, hit), not
    * the score.
    */
  private def q30(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 10)
    Ann.cosineTopK(queries, e, k = 5)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }
  private val q30Sql =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS id,
      |    list_cosine_similarity(q.embedding, c.embedding) AS score
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10),
      |ranked AS (
      |  SELECT query_id, id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, id FROM ranked
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed cosine top-k (the scale path), with a FULL value
    * oracle: the hyperplanes are md5-derived ±1 vectors
    * ([[graft.text.Ann]]), so DuckDB rebuilds the same projections,
    * 4-bit band keys (16 tables over 64 planes), candidate buckets, exact cosine
    * rescore and ranking. Any banding or recall regression breaks the
    * hash match; TextOpsSpec separately asserts recall ≥ 0.9 vs exact.
    */
  private def q31(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.core.ScaleKnob.sample(Tables.embeddings(spark, dir), "vec_id")
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
    Ann.lshCosineTopK(queries, e, k = 5)
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }
  // mirrors LshConfig defaults: bits=4, tables=16 (64 planes), seed=42;
  // plane entry (p,i) = ±1 from the low bit of md5("42:p:i"), table
  // t = p//4, bit position b = p%4, bucket bit set when dot >= 0
  private val q31Sql =
    """WITH planes AS (
      |  SELECT p, i,
      |    CASE WHEN (strpos('0123456789abcdef',
      |                substr(md5('42:' || p || ':' || i), 16, 1)) - 1) & 1 = 1
      |      THEN 1.0 ELSE -1.0 END AS s
      |  FROM (SELECT unnest(generate_series(0, 63)) AS p),
      |       (SELECT unnest(generate_series(0, 63)) AS i)),
      |vecs AS (
      |  -- mirrors the kernel's pre-banding degenerate filter (r19):
      |  -- zero/NaN/Inf vectors are excluded from candidate generation
      |  -- on the Spark side (they all land in bucket t:0 and can only
      |  -- ever rescore to the defined 0), so the replay excludes them
      |  -- too. Identity on this corpus (all vectors finite, non-zero).
      |  SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings,
      |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
      |  WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x) OR x IS NULL)) = 0
      |    AND len(list_filter(embedding, x -> x <> 0)) > 0),
      |dots AS (
      |  SELECT v.vec_id, pl.p, SUM(v.x * pl.s) AS d
      |  FROM vecs v JOIN planes pl ON v.i = pl.i
      |  GROUP BY 1, 2),
      |sigs AS (
      |  SELECT vec_id, p // 4 AS t,
      |    SUM(CASE WHEN d >= 0 THEN CAST(pow(2, p % 4) AS BIGINT) ELSE 0 END) AS key
      |  FROM dots GROUP BY 1, 2),
      |cands AS (
      |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS id
      |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.key = c.key
      |  WHERE q.vec_id < 10),
      |scored AS (
      |  SELECT ca.query_id, ca.id,
      |    list_cosine_similarity(qe.embedding, ce.embedding) AS score
      |  FROM cands ca
      |  JOIN embeddings qe ON qe.vec_id = ca.query_id
      |  JOIN embeddings ce ON ce.vec_id = ca.id),
      |ranked AS (
      |  SELECT query_id, id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, id FROM ranked
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate detection (the dedup family's
    * vector sibling): 50 exact duplicate vectors injected at
    * vec_id + 10000, pairs at cosine ≥ 0.99 via the LSH-bucketed join.
    * Exact duplicates share every bucket, so LSH finds them all, and it
    * never false-accepts — the oracle is therefore the first-principles
    * all-pairs cosine filter (native cross-vector cosine tops out ≈ 0.6
    * on this corpus, so the threshold isolates the construction).
    * Scores are dropped from the output: the two engines sum FP in
    * different orders (the q30 rank-compare precedent).
    */
  private def q35(spark: SparkSession, dir: String): DataFrame = {
    // duplicates are injected BEFORE ScaleKnob.sample, so under bench
    // replication the +10000 offset is shard-remapped (id·n+k) along
    // with every other id and can never collide with a real replicated
    // id — injecting after sample() broke the disjoint-shard invariant
    // (base ids 1000-1004 across 10 shards land exactly on 10000-10049).
    // Under frac-sampling the order is equivalent: vec_id+10000 keeps
    // vec_id mod 1000, so a duplicate survives iff its base row does.
    val base = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val withDups = base.unionByName(
      base.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val corpus = graft.core.ScaleKnob.sample(withDups, "vec_id")
    // near-dup detection tolerates much tighter buckets than generic
    // top-k: at cos ≥ 0.99 (θ ≈ 8°) per-bit collision is ~0.955, so 12
    // bits × 6 tables still gives ≈ 99% expected recall — while the
    // corpus's label clusters (cross cosine up to ~0.6, per-bit ~0.7)
    // collide at only 0.7¹² ≈ 1.5% per table, keeping the self-join's
    // candidate set near-linear instead of cluster-quadratic
    Ann.cosineNearDuplicates(corpus, threshold = 0.99,
        Ann.LshConfig(bits = 12, tables = 6))
      .select(col("a"), col("b"))
      .orderBy(col("a"), col("b"))
  }
  private val q35Sql =
    """WITH corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 50)
      |SELECT a.vec_id AS a, b.vec_id AS b
      |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
      |ORDER BY a, b""".stripMargin

  /** Multimodal plumbing, driver-visible with a construction oracle:
    * binary media columns are synthesized from the documents corpus
    * (stub header with dimensions derived from doc_id, text bytes as
    * payload), then decoded back through [[graft.text.Multimodal]] —
    * metadata extraction and frame sampling. The oracle re-derives
    * every output from the construction (the texts are pure ASCII, so
    * `length(text)` IS the payload byte count), which pins the whole
    * encode → decode → sample round trip value-level. The codec itself
    * stays an honestly-stubbed boundary (no media libs here).
    */
  private def q37(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    val encodeUdf = udf { (id: Long, text: String) =>
      Multimodal.StubCodec.encodeHeader("image", "fakepng",
        (id % 640 + 1).toInt, (id % 480 + 1).toInt, 0L) ++
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    // plain scan, not docsWide (r21): q37's kernels are stub header
    // parses — cheap enough that the widening exchange is pure overhead
    // (A/B'd 1.35x slower with it even in a favorable window)
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), encodeUdf(col("doc_id"), col("text")).as("content"))
    val meta = Multimodal.withMetadata(media, "content")
      .select(col("doc_id"),
        col("media_meta.media_type").as("media_type"),
        col("media_meta.format").as("format"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        (col("media_meta.size_bytes") - Multimodal.StubCodec.HeaderBytes)
          .as("payload_bytes"))
    val frames = Multimodal.sampleFrames(media, "content")
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    meta.join(frames, "doc_id").orderBy("doc_id")
  }
  private val q37Sql =
    """SELECT doc_id,
      |  'image' AS media_type, 'fakepng' AS format,
      |  CAST(doc_id % 640 + 1 AS INTEGER) AS width,
      |  CAST(doc_id % 480 + 1 AS INTEGER) AS height,
      |  CAST(length(text) AS BIGINT) AS payload_bytes,
      |  CAST(CEIL(CEIL(length(text) / 64.0) / 4.0) AS BIGINT) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** §2.12 batch shape of the streaming window operator: the same
    * `window()` expression `Streams.windowedEventCounts` uses, run in
    * batch mode with a DuckDB time_bucket oracle.
    */
  private def q32(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // DEFINED null-event-time semantics (r19): rows without a
      // timestamp are dropped, matching what the streaming twin's
      // watermark does — rather than an accidental engine-specific
      // null-window group. The oracle mirrors the filter.
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"), col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))
  private val q32Sql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events
      |FROM events
      |WHERE ts IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** §2.12 session windows in batch: per-user sessions split on 30
    * minutes of event-time silence via the built-in `session_window`
    * (the declarative twin of `Streams.userSessions`). The oracle
    * re-derives sessionization from first principles: a lag-over-user
    * break flag, a running sum as session id, then min/count per
    * session. `session_window.end` (last event + gap, a Spark
    * convention) is intentionally not emitted.
    */
  private def q36(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // same defined null-event-time semantics as q32
      .filter(col("ts").isNotNull)
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  private val q36Sql =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL '30 minutes'
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events WHERE ts IS NOT NULL),
      |numbered AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
      |FROM numbered
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** REAL image decode through `javax.imageio`: deterministic grayscale
    * PNGs are generated per doc_id (dimensions and every pixel's luma are
    * closed-form in doc_id), encoded to actual PNG bytes, then decoded
    * back — header-only metadata (format/width/height) plus a full pixel
    * decode summed to one luma checksum. PNG is lossless, so the oracle
    * re-derives width/height AND the per-pixel sum straight from the
    * generator formula: a hash match proves the codec really decoded the
    * pixel data, not just parsed a header.
    */
  /** The shared closed-form media generators: one definition per
    * modality because q38/q46/q48 (images) and q42/q45/q47 (clips) must
    * agree with each other AND with every sibling oracle's hard-coded
    * formula — a drifted copy would silently desynchronize a query from
    * its oracle.
    */
  private val pngImageUdf = udf { (id: Long) =>
    graft.text.Multimodal.ImageIoCodec.encodePng(
      (id % 29 + 4).toInt, (id % 23 + 4).toInt, id)
  }
  private val wavClipUdf = udf { (id: Long) =>
    graft.text.Multimodal.WavCodec.encodeWav((id % 400 + 50).toInt, 8000, id)
  }

  /** Shared decode UDFs, hoisted for the same reason as the generators
    * above: q38/q44/q46 (image metadata + luma) and q42/q47 (audio
    * metadata + sample sum) must decode identically — per-query local
    * re-declarations of the same body can drift.
    */
  private val imageMetaUdf =
    udf { (b: Array[Byte]) => graft.text.Multimodal.ImageIoCodec.imageMetadata(b) }
  private val pixelLumaSumUdf =
    udf { (b: Array[Byte]) => graft.text.Multimodal.ImageIoCodec.pixelLumaSum(b) }
  private val audioMetaUdf =
    udf { (b: Array[Byte]) => graft.text.Multimodal.WavCodec.audioMetadata(b) }
  private val sampleSumUdf =
    udf { (b: Array[Byte]) => graft.text.Multimodal.WavCodec.sampleSum(b) }

  private def q38(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    val imgs = docsWide(spark, dir)
      .select(col("doc_id"), pngImageUdf(col("doc_id")).as("content"))
    Multimodal.withImageMetadata(imgs, "content")
      .select(col("doc_id"),
        col("media_meta.format").as("format"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        pixelLumaSumUdf(col("content")).as("pixel_luma_sum"))
      .orderBy(col("doc_id"))
  }
  private val q38Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 29 + 4 AS w, doc_id % 23 + 4 AS h
      |  FROM documents
      |), xs AS (
      |  SELECT doc_id, w, h, unnest(range(w)) AS x FROM d
      |), xy AS (
      |  SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs
      |)
      |SELECT doc_id, 'png' AS format,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(sum((31 * x + 17 * y + doc_id) % 256) AS BIGINT) AS pixel_luma_sum
      |FROM xy
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin

  /** REAL audio decode through `javax.sound.sampled` (the audio twin of
    * q38): deterministic 16-bit PCM mono WAV clips are generated per
    * doc_id (length and every sample closed-form in doc_id), encoded to
    * actual RIFF/WAVE bytes, then decoded back — header-only metadata
    * (container/channels/rate/frames/duration) plus a full PCM decode
    * summed to one sample checksum. PCM is lossless, so the oracle
    * re-derives the frame count AND the per-sample sum straight from the
    * generator formula: a hash match proves the codec really decoded the
    * sample data, not just parsed a header. With this and q44's
    * per-frame decode, only the video container demux remains stubbed.
    */
  private def q42(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    docsWide(spark, dir)
      .select(col("doc_id"), wavClipUdf(col("doc_id")).as("content"))
      .select(col("doc_id"), audioMetaUdf(col("content")).as("m"),
        sampleSumUdf(col("content")).as("sample_sum"))
      .select(col("doc_id"),
        col("m._1").as("format"),
        col("m._2").as("channels"),
        col("m._3").as("sample_rate"),
        col("m._4").as("n_frames"),
        col("m._5").as("duration_ms"),
        col("sample_sum"))
      .orderBy(col("doc_id"))
  }
  private val q42Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 400 + 50 AS n FROM documents
      |), s AS (
      |  SELECT doc_id, n, unnest(range(n)) AS i FROM d
      |)
      |SELECT doc_id, 'wave' AS format,
      |  CAST(1 AS INTEGER) AS channels, CAST(8000 AS INTEGER) AS sample_rate,
      |  CAST(n AS BIGINT) AS n_frames,
      |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
      |  CAST(sum((173 * i + doc_id) % 4001 - 2000) AS BIGINT) AS sample_sum
      |FROM s
      |GROUP BY doc_id, n
      |ORDER BY doc_id""".stripMargin

  /** Image RESIZE through the real codec both ways: q38's closed-form
    * PNGs are decoded, nearest-neighbor-resampled to a fixed 8×6
    * thumbnail, re-encoded as real PNG, then decoded AGAIN for the luma
    * checksum — the decode → transform → re-encode → decode chain is
    * what a thumbnailing/normalizing training pipeline runs per image.
    * NN sampling is exactly specified (target (tx,ty) reads source
    * (tx·w/8, ty·h/6), integer floor), so the oracle re-derives every
    * resized pixel from the generator formula; a hash match pins the
    * resample indexing AND both codec passes, with no interpolation
    * tolerance anywhere.
    */
  private def q46(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    val resizeUdf = udf { (b: Array[Byte]) =>
      Multimodal.ImageIoCodec.resizeNearest(b, 8, 6)
    }
    docsWide(spark, dir)
      .select(col("doc_id"), resizeUdf(pngImageUdf(col("doc_id"))).as("thumb"))
      .select(col("doc_id"), imageMetaUdf(col("thumb")).as("m"),
        pixelLumaSumUdf(col("thumb")).as("thumb_luma_sum"))
      .select(col("doc_id"),
        col("m._2").as("width"),
        col("m._3").as("height"),
        col("thumb_luma_sum"))
      .orderBy(col("doc_id"))
  }
  private val q46Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 29 + 4 AS w, doc_id % 23 + 4 AS h
      |  FROM documents
      |), xs AS (
      |  SELECT doc_id, w, h, unnest(range(8)) AS tx FROM d
      |), xy AS (
      |  SELECT doc_id, w, h, tx, unnest(range(6)) AS ty FROM xs
      |)
      |SELECT doc_id,
      |  CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
      |  CAST(sum((31 * (tx * w // 8) + 17 * (ty * h // 6) + doc_id) % 256) AS BIGINT)
      |    AS thumb_luma_sum
      |FROM xy
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Audio QUALITY scoring over real decoded PCM (the audio twin of
    * q28/q29's text quality pillar): a training pipeline drops silent,
    * DC-biased, or clipped clips and uses the zero-crossing rate as a
    * cheap noise/tonality signal. The clips are q42's closed-form WAVs;
    * every statistic is integer-exact (count / sum / sum of squares /
    * strict sign-change count / peak magnitude — RMS is one division
    * away), so the DuckDB oracle re-derives the whole feature row from
    * the generator formula with no float tolerance anywhere.
    */
  private def q45(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    val statsUdf = udf { (b: Array[Byte]) => Multimodal.WavCodec.audioStats(b) }
    docsWide(spark, dir)
      .select(col("doc_id"), statsUdf(wavClipUdf(col("doc_id"))).as("s"))
      .select(col("doc_id"),
        col("s._1").as("n_samples"),
        col("s._2").as("sample_sum"),
        col("s._3").as("sample_sumsq"),
        col("s._4").as("zero_crossings"),
        col("s._5").as("peak"))
      .orderBy(col("doc_id"))
  }
  private val q45Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 400 + 50 AS n FROM documents
      |), s AS (
      |  SELECT doc_id, n, unnest(range(n)) AS i FROM d
      |), v AS (
      |  SELECT doc_id, n, i, (173 * i + doc_id) % 4001 - 2000 AS x FROM s
      |), w AS (
      |  SELECT doc_id, n, x, lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
      |  FROM v
      |)
      |SELECT doc_id,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(sum(x) AS BIGINT) AS sample_sum,
      |  CAST(sum(x * x) AS BIGINT) AS sample_sumsq,
      |  CAST(sum(CASE WHEN px IS NOT NULL AND x * px < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS zero_crossings,
      |  CAST(max(abs(x)) AS INTEGER) AS peak
      |FROM w
      |GROUP BY doc_id, n
      |ORDER BY doc_id""".stripMargin

  /** Image QUALITY scoring over real decoded pixels (completing the
    * quality pillar across modalities: text q28/q29, audio q45, image
    * here): a training pipeline drops dark/blank, washed-out, or
    * clipped images using mean/variance/extremes of the luma channel.
    * Every statistic is integer-exact (count / sum / sum of squares /
    * min / max), so the DuckDB oracle re-derives the whole feature row
    * from q38's closed-form pixel generator with no float tolerance.
    */
  private def q48(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    val statsUdf = udf { (b: Array[Byte]) => Multimodal.ImageIoCodec.imageStats(b) }
    docsWide(spark, dir)
      .select(col("doc_id"), statsUdf(pngImageUdf(col("doc_id"))).as("s"))
      .select(col("doc_id"),
        col("s._1").as("n_pixels"),
        col("s._2").as("luma_sum"),
        col("s._3").as("luma_sumsq"),
        col("s._4").as("luma_min"),
        col("s._5").as("luma_max"))
      .orderBy(col("doc_id"))
  }
  private val q48Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 29 + 4 AS w, doc_id % 23 + 4 AS h
      |  FROM documents
      |), xs AS (
      |  SELECT doc_id, w, h, unnest(range(w)) AS x FROM d
      |), xy AS (
      |  SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs
      |), px AS (
      |  SELECT doc_id, w, h, (31 * x + 17 * y + doc_id) % 256 AS v FROM xy
      |)
      |SELECT doc_id,
      |  CAST(w * h AS BIGINT) AS n_pixels,
      |  CAST(sum(v) AS BIGINT) AS luma_sum,
      |  CAST(sum(v * v) AS BIGINT) AS luma_sumsq,
      |  CAST(min(v) AS INTEGER) AS luma_min,
      |  CAST(max(v) AS INTEGER) AS luma_max
      |FROM px
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin

  /** Audio RESAMPLE through the real codec both ways (the audio twin of
    * q46's image resize): q42's 8 kHz closed-form clips are decoded,
    * nearest-neighbor-resampled to 5 kHz (a non-divisor ratio, so the
    * floor indexing actually matters), re-encoded as real WAV at the new
    * rate, then decoded AGAIN for metadata and the sample checksum —
    * rate normalization is what a speech pipeline runs before feature
    * extraction. NN indexing is exactly specified (output j reads source
    * `j·8000/5000`, length `n·5000/8000`, integer floors), so the oracle
    * re-derives the resampled stream from the generator formula and a
    * hash match pins the resample arithmetic AND both codec passes.
    */
  private def q47(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    val resampleUdf = udf { (b: Array[Byte]) =>
      Multimodal.WavCodec.resampleNearest(b, 5000)
    }
    docsWide(spark, dir)
      .select(col("doc_id"), resampleUdf(wavClipUdf(col("doc_id"))).as("clip"))
      .select(col("doc_id"), audioMetaUdf(col("clip")).as("m"),
        sampleSumUdf(col("clip")).as("sample_sum"))
      .select(col("doc_id"),
        col("m._3").as("sample_rate"),
        col("m._4").as("n_frames"),
        col("m._5").as("duration_ms"),
        col("sample_sum"))
      .orderBy(col("doc_id"))
  }
  private val q47Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 400 + 50 AS n FROM documents
      |), o AS (
      |  SELECT doc_id, n, n * 5000 // 8000 AS m FROM d
      |), s AS (
      |  SELECT doc_id, n, m, unnest(range(m)) AS j FROM o
      |)
      |SELECT doc_id,
      |  CAST(5000 AS INTEGER) AS sample_rate,
      |  CAST(m AS BIGINT) AS n_frames,
      |  CAST(m * 1000 // 5000 AS BIGINT) AS duration_ms,
      |  CAST(sum((173 * (j * 8000 // 5000) + doc_id) % 4001 - 2000) AS BIGINT)
      |    AS sample_sum
      |FROM s
      |GROUP BY doc_id, m
      |ORDER BY doc_id""".stripMargin

  /** Video frame-sampling with REAL container demux and per-frame
    * decode: deterministic AVI clips (PNG payload frames — dimensions,
    * frame count, and every frame's pixels closed-form in doc_id) are
    * demuxed through the hand-written RIFF walker
    * ([[graft.text.Multimodal.AviCodec]]), every second frame is
    * sampled out of the `movi` list, and each sampled frame goes
    * through the real `javax.imageio` decode — header metadata plus a
    * full pixel-luma sum. The oracle re-derives the sampled frame set
    * AND each frame's pixel sum from the generator formula, so a hash
    * match proves the demux → explode → per-frame-decode pipeline is
    * real end-to-end: a wrong chunk boundary, a missed pad byte, or a
    * misread frame order all break the hash.
    */
  /** Shared q44/q49 clip generator — ONE definition of the closed-form
    * fixture parameters `(w, h, nFrames, frameMs) = f(doc_id)` so the
    * two queries (and both oracles, which re-derive these) can never
    * silently diverge on the clip shape.
    */
  private val aviClipUdf = udf { (id: Long) =>
    graft.text.Multimodal.AviCodec.encodeAviPngSeq(
      (id % 7 + 4).toInt, (id % 5 + 3).toInt, (id % 5 + 2).toInt, 40L, id)
  }

  private def q44(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    // ScaleKnob is identity at the default frac=1.0 (oracle unchanged);
    // the bench scaling pass shrinks the corpus to show the media
    // family's per-row linearity alongside the similarity exponents
    val clips = graft.core.ScaleKnob.sample(docsWide(spark, dir), "doc_id")
      .select(col("doc_id"), aviClipUdf(col("doc_id")).as("content"))
    Multimodal.sampleAviFrames(clips, "content", stride = 2)
      .select(col("doc_id"), col("frame_idx"), imageMetaUdf(col("frame")).as("m"),
        pixelLumaSumUdf(col("frame")).as("frame_luma_sum"))
      .select(col("doc_id"), col("frame_idx"),
        col("m._1").as("format"),
        col("m._2").as("width"),
        col("m._3").as("height"),
        col("frame_luma_sum"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
  private val q44Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 7 + 4 AS w, doc_id % 5 + 3 AS h,
      |         doc_id % 5 + 2 AS nf
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, w, h, unnest(range(nf)) AS t FROM d
      |), xs AS (
      |  SELECT doc_id, w, h, t, unnest(range(w)) AS x FROM f WHERE t % 2 = 0
      |), xy AS (
      |  SELECT doc_id, w, h, t, x, unnest(range(h)) AS y FROM xs
      |)
      |SELECT doc_id, CAST(t AS INTEGER) AS frame_idx, 'png' AS format,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(sum((31 * x + 17 * y + doc_id + 97 * t) % 256) AS BIGINT) AS frame_luma_sum
      |FROM xy
      |GROUP BY doc_id, t, w, h
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Video METADATA at corpus scale: the header-only triage path a real
    * pipeline runs before committing to any frame decode (drop clips by
    * dimensions/duration/frame count first — decoding is orders of
    * magnitude dearer than header parsing). Each doc_id's AVI clip is
    * built by the real muxer, and `aviMetadata` walks `hdrl` —
    * `avih` for dimensions/frame count/duration, the first `strl`'s
    * `strh` for the codec handler — WITHOUT touching `movi`. Every
    * field is closed-form in doc_id, so the oracle re-derives all five
    * from the generator parameters: a misparsed offset, a wrong
    * scale/rate unit, or a handler read from the wrong fourcc all
    * break the hash.
    */
  private def q49(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Multimodal
    val metaUdf = udf { (b: Array[Byte]) => Multimodal.AviCodec.aviMetadata(b) }
    docsWide(spark, dir)
      .select(col("doc_id"), metaUdf(aviClipUdf(col("doc_id"))).as("m"))
      .select(col("doc_id"),
        col("m._1").as("handler"),
        col("m._2").as("width"),
        col("m._3").as("height"),
        col("m._4").as("n_frames"),
        col("m._5").as("duration_ms"))
      .orderBy(col("doc_id"))
  }
  private val q49Sql =
    """SELECT doc_id, 'mpng' AS handler,
      |  CAST(doc_id % 7 + 4 AS INTEGER) AS width,
      |  CAST(doc_id % 5 + 3 AS INTEGER) AS height,
      |  CAST(doc_id % 5 + 2 AS BIGINT) AS n_frames,
      |  CAST((doc_id % 5 + 2) * 40 AS BIGINT) AS duration_ms
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** IVF ANN driver-visible with an exact oracle: at nProbe = nList every
    * cell is probed, so assign → probe → rescore → rank MUST equal the
    * brute-force top-k whatever the centroid sample — which pins the
    * whole inverted-file dataflow without the oracle having to replay
    * Spark's murmur3 centroid selection. The pruning benefit and recall
    * floor at nProbe < nList are asserted in TextOpsSpec. Rank-compared
    * like q30 (float summation order differs across engines); the oracle
    * IS q30's SQL — any IVF-specific loss (a dropped cell, a mis-assigned
    * vector, a probe-join bug) breaks the hash match.
    */
  private def q40(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 10)
    Ann.ivfCosineTopK(queries, e, k = 5, Ann.IvfConfig(nList = 16, nProbe = 16))
      .select(col("query_id"), col("rank"), col("id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val defs: Seq[Q] = Seq(
    Q("q32_event_time_window", q32, Some(q32Sql)),
    Q("q36_session_window", q36, Some(q36Sql)),
    Q("q24_exact_dedup", q24, Some(q24Sql)),
    Q("q25_minhash_dedup", q25, Some(q27Sql)),
    Q("q26_simhash_dedup", q26, Some(q26Sql)),
    Q("q27_ngram_jaccard_dedup", q27, Some(q27Sql)),
    Q("q28_text_stats", q28, Some(q28Sql)),
    Q("q29_text_analysis", q29, Some(q29Sql)),
    Q("q50_winnowing_sketch", q50, Some(q50Sql)),
    Q("q30_cosine_topk", q30, Some(q30Sql)),
    Q("q31_ann_lsh_topk", q31, Some(q31Sql)),
    Q("q35_cosine_near_dup", q35, Some(q35Sql)),
    Q("q37_multimodal_roundtrip", q37, Some(q37Sql)),
    Q("q38_image_decode", q38, Some(q38Sql)),
    Q("q40_ann_ivf_topk", q40, Some(q30Sql)),
    Q("q42_audio_decode", q42, Some(q42Sql)),
    Q("q44_video_frame_decode", q44, Some(q44Sql)),
    Q("q45_audio_quality", q45, Some(q45Sql)),
    Q("q46_image_resize", q46, Some(q46Sql)),
    Q("q47_audio_resample", q47, Some(q47Sql)),
    Q("q48_image_quality", q48, Some(q48Sql)),
    Q("q49_video_metadata", q49, Some(q49Sql)))
}
