package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3
import graft.core.SessionHygiene.TrackedCheckpoint

/** Document deduplication at training-data scale: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Every variant is a bucketed dataflow — shingle/band/bucket keys are
  * exploded and candidates meet in EQUI-joins; there is no all-pairs
  * scoring anywhere. At 100 TB the shuffle keys are band hashes whose
  * fan-in is bounded by collision width, and AQE's skew handling covers
  * hot buckets (boilerplate documents).
  *
  * The shingled bases are `localCheckpoint`ed (they feed banding plus
  * both rescore joins); in a long-lived session, release them at job
  * boundaries with [[graft.core.SessionHygiene.releaseLeftovers]].
  */
object Dedup {

  /** Exact dedup by content hash (md5 over the raw text). Returns one row
    * per distinct content with the member ids and group size.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("group_size"),
        sort_array(collect_list(col(idCol))).as("member_ids"),
        min(col(idCol)).as("canonical_id"))

  /** Word k-shingles of the lowercased text (codegen'd column expr). */
  def wordShingles(text: Column, k: Int): Column = {
    // leading AND trailing whitespace are stripped BEFORE the split:
    // Java regex split emits an empty token at BOTH edges (a leading
    // empty for "^\s", trailing empties for limit -1), so "\thello"
    // would tokenize as ["","hello"] and mint a phantom empty-string
    // shingle token, and "hello world\t" would shingle to
    // "hello world " — never matching the identical document without
    // the edge whitespace. Spark trim alone is not enough (it strips
    // only spaces), hence the ^\s+|\s+$ regexp (r19; the r18 fix
    // stripped only the trailing side). The SQL oracle's gram
    // derivation (q27Sql) mirrors this exact normalization.
    val toks = split(regexp_replace(lower(text), "^\\s+|\\s+$", ""), "\\s+")
    // TOKENLESS text (empty or all-whitespace) shingles as NOTHING:
    // split("") is [""], so the short-text fallback below would hand
    // every such document one identical phantom shingle — all blanks
    // would pair with each other at jaccard 1.0 (plus a quadratic
    // candidate blowup on a blank-heavy corpus). rlike(\S), not
    // length(trim(..)) === 0: Spark trim strips only SPACES, so a
    // tab/newline-only document passes a trim guard and still produces
    // the phantom (the simHashDuplicates r17 fix, same class). A
    // no-content document has nothing to near-dup on; exact dedup
    // still groups blanks.
    when(!text.rlike("\\S"), array().cast("array<string>"))
      // fewer than k tokens (but nonempty): the whole text is the one
      // shingle, so identical short documents still dedup
      .when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Character k-shingles on the normalized text. */
  def charShingles(text: String, k: Int): Seq[String] = {
    // WhitespaceRe (hoisted below): this runs per ROW and
    // String.replaceAll re-compiles its pattern per call
    val norm = if (text == null) ""
      else WhitespaceRe.matcher(text.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ").trim
    if (norm.length <= k) Seq(norm) else (0 to norm.length - k).map(i => norm.substring(i, i + k))
  }

  // --- MinHash ------------------------------------------------------------

  /** Deterministic MinHash signature over a shingle set. One murmur3 base
    * hash per shingle; permutation i is the affine map `a_i·h + b_i`
    * (odd multipliers from a seeded splitmix), so the per-shingle cost is
    * `numPerm` multiplications instead of `numPerm` string hashes.
    */
  def minHashSignature(shingles: Seq[String], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val coef = permCoefficients(numPerm)
    for (s <- shingles) {
      val base = (MurmurHash3.stringHash(s, 0x12345678).toLong << 32) |
        (MurmurHash3.stringHash(s, 0x9e3779b9) & 0xffffffffL)
      var i = 0
      while (i < numPerm) {
        val h = coef(2 * i) * base + coef(2 * i + 1)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Deterministic (a_i, b_i) pairs via splitmix64; a_i forced odd. */
  private def permCoefficients(numPerm: Int): Array[Long] = {
    val out = new Array[Long](numPerm * 2)
    var x = 0x243f6a8885a308d3L
    var i = 0
    while (i < out.length) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      out(i) = if (i % 2 == 0) z | 1L else z
      i += 1
    }
    out
  }

  /** Exact Jaccard between two shingle sets (used for candidate rescore). */
  def jaccard(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet; val sb = b.toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  final case class MinHashConfig(
      shingleSize: Int = 3, // word shingles
      numPerm: Int = 64,
      bands: Int = 16, // rows per band = numPerm / bands
      jaccardThreshold: Double = 0.7)

  /** MinHash+LSH near-duplicate pairs: shingle → signature → band hashes
    * (exploded) → bucket equi-join → exact-Jaccard rescore. Returns
    * `(a, b, jaccard)` with `a < b` and jaccard ≥ threshold.
    */
  def minHashDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    require(cfg.numPerm % cfg.bands == 0, "bands must divide numPerm")
    val rows = cfg.numPerm / cfg.bands
    // one shingles -> band-keys UDF, with the null/empty guard up front:
    // a null text yields a NULL shingle array (the kernel would NPE),
    // and an EMPTY shingle set (null or shorter-than-k text) must emit
    // NO bands — minHashSignature(Nil) is the constant all-MaxValue
    // signature, so every such document would share every band and the
    // self-join would emit all their pairs (the rescore filters them,
    // but only after a quadratic candidate blowup at scale; the
    // Clustering.minHashCandidates precedent)
    val bandsUdf = udf { (toks: Seq[String]) =>
      if (toks == null || toks.isEmpty) Seq.empty[String]
      else {
        val sig = minHashSignature(toks, cfg.numPerm)
        sig.grouped(rows).zipWithIndex.map { case (band, i) =>
          s"$i:${MurmurHash3.orderedHash(band)}"
        }.toSeq
      }
    }
    // materialize the shingled base ONCE: it feeds the banding and both
    // rescore joins — without this the corpus scan + shingle kernel
    // re-run per consumer (at scale: three full passes instead of one)
    val shingled = df.select(col(idCol).as("id"),
      wordShingles(col(textCol), cfg.shingleSize).as("shingles"))
      .trackedCheckpoint()
    // band join carries IDS ONLY: shuffling each document's shingle set
    // once per band (×bands) is the classic LSH scale mistake — the
    // payload rejoins exactly once per surviving candidate below, the
    // same shape as ngramJaccardDuplicates' rescore
    val banded = shingled
      .select(col("id"), explode(bandsUdf(col("shingles"))).as("band"))
    // pinned width (r21): the candidate set feeds the exact-Jaccard
    // rescore (array joins + kernel fused after the final aggregate),
    // which AQE byte-coalescing otherwise runs on a handful of tasks —
    // see [[graft.core.Parallelism.pinnedDistinct]]
    val candidates = graft.core.Parallelism.pinnedDistinct(
      banded.select(col("band"), col("id").as("a"))
        .join(banded.select(col("band"), col("id").as("b")), "band")
        .filter(col("a") < col("b"))
        .select("a", "b"),
      col("a"), col("b"))
    // asNondeterministic (r21, guide §4.4): the threshold filter over the
    // projected jaccard otherwise substitutes the UDF into itself —
    // filter and projection each evaluate the kernel once per candidate.
    // The kernel is pure; the flag only blocks that duplication.
    val jacUdf = udf { (a: Seq[String], b: Seq[String]) => jaccard(a, b) }
      .asNondeterministic()
    candidates
      .join(shingled.select(col("id").as("a"), col("shingles").as("sa")), "a")
      .join(shingled.select(col("id").as("b"), col("shingles").as("sb")), "b")
      .withColumn("jaccard", jacUdf(col("sa"), col("sb")))
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select("a", "b", "jaccard")
  }

  // --- SimHash ------------------------------------------------------------

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 64-bit token hash: the first 8 bytes of md5(token),
    * big-endian. md5 is the one hash both this engine and the DuckDB
    * oracle compute identically (`('0x' || substr(md5(t),1,16))`), which
    * makes the SimHash pipeline value-verifiable end to end — signature
    * construction included — instead of rows-only.
    */
  def tokenHash64(tok: String): Long = {
    val d = md5Digest.get().digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash over whitespace tokens (md5-based token hash — see
    * [[tokenHash64]]).
    */
  private val WhitespaceRe = java.util.regex.Pattern.compile("\\s+")

  def simHash(text: String): Long = {
    if (text == null) return 0L
    val weights = new Array[Int](64)
    for (tok <- WhitespaceRe.split(text.toLowerCase(java.util.Locale.ROOT)) if tok.nonEmpty) {
      val h = tokenHash64(tok)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) weights(bit) += 1 else weights(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (weights(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  val simHashUdf = udf(simHash _)

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash near-duplicate pairs with Hamming distance ≤ maxDistance.
    * Pigeonhole banding: 4 16-bit bands — any pair within distance 3
    * agrees on at least one band, so candidates meet in a band equi-join.
    */
  def simHashDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3): DataFrame = {
    require(maxDistance <= 3, "4-band pigeonhole covers Hamming distance <= 3")
    // one materialized pass for the signature UDF; both join sides reuse it.
    // The tokenless guard (null/empty/whitespace-only text) mirrors
    // wordShingles' and minHashDuplicates': such documents all hash to
    // the zero signature, so WITHOUT the filter every pair of them meets
    // in every band and comes back Hamming 0 — phantom "near-dups"
    // between documents that share no content, a quadratic candidate
    // blowup on a corpus with many blanks, and a divergence from the q26
    // oracle, whose token stream drops them. A no-content document has
    // nothing to near-dup on; exact dedup still groups blanks.
    // rlike(\S), not length(trim(..)) > 0: Spark trim strips only
    // SPACES, so a tab/newline-only document would pass a trim guard
    // and still hash to zero — "contains a non-whitespace char" is
    // exactly "produces at least one token" in both engines.
    val hashed = df
      .filter(col(textCol).rlike("\\S"))
      .select(col(idCol).as("id"), simHashUdf(col(textCol)).as("sim"))
      .trackedCheckpoint()
    val bandUdf = udf { (h: Long) =>
      (0 until 4).map(i => s"$i:${(h >>> (i * 16)) & 0xffffL}")
    }
    val banded = hashed.withColumn("band", explode(bandUdf(col("sim"))))
    val l = banded.select(col("band"), col("id").as("a"), col("sim").as("ha"))
    val r = banded.select(col("band"), col("id").as("b"), col("sim").as("hb"))
    // asNondeterministic: same double-evaluation guard as jacUdf above
    val hamUdf = udf { (x: Long, y: Long) => hammingDistance(x, y) }
      .asNondeterministic()
    l.join(r, "band")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", hamUdf(col("ha"), col("hb")))
      .filter(col("hamming") <= maxDistance)
      .select("a", "b", "hamming")
  }

  // --- n-gram Jaccard via inverted-index join -----------------------------

  /** N-gram Jaccard near-duplicate pairs with EXACT prefix filtering:
    * grams are globally ordered by document frequency (rarest first) and
    * only each document's first `n − ⌈t·n⌉ + 1` grams enter the inverted
    * join — any pair with Jaccard ≥ t must share a gram inside both
    * prefixes, so no qualifying pair is lost. Candidates (tiny after the
    * filter) are rescored exactly from the full distinct-gram counts via
    * a second shared-gram aggregation. Hot grams (boilerplate) land at
    * the END of the ordering and mostly fall outside prefixes, which is
    * what keeps the join sub-quadratic on skewed corpora.
    */
  def ngramJaccardDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.7): DataFrame = {
    // materialize the shingled base ONCE — the inverted index, the
    // document-frequency aggregate, the prefix windows and both rescore
    // joins all hang off it; without this each consumer re-runs the
    // corpus scan + shingle kernel (measured: more than half of q27's
    // wall time at sf0.1 was that recomputation)
    val shingled = df.select(col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), k)).as("sh"))
      .trackedCheckpoint()
    // n (distinct grams per doc) carried from the array instead of a
    // second count-over-partition window (r21): same value — `sh` is
    // array_distinct'ed, so size(sh) = the doc's inv row count — one
    // window pass instead of two
    val inv = shingled.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
    // global rarest-first gram order
    val gramDf = inv.groupBy("g").agg(count(lit(1)).as("df"))
    val ranked = inv.join(gramDf, "g")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("g"))
    // prefix: first n - ceil(t*n) + 1 grams. CHECKPOINTED (r21): the
    // candidate self-join reads it on both sides, and the join is a
    // broadcast at this corpus size, so without materialization each
    // side re-runs the whole df-rank window chain (measured: two
    // identical 3.5 s-CPU window stages per q27 run).
    val prefix = ranked
      .withColumn("pos", row_number().over(byDoc))
      .filter(col("pos") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("g", "id")
      .trackedCheckpoint()
    // pinned width (r21), same rationale as minHashDuplicates' candidates
    val candidates = graft.core.Parallelism.pinnedDistinct(
      prefix.select(col("g"), col("id").as("a"))
        .join(prefix.select(col("g"), col("id").as("b")), "g")
        .filter(col("a") < col("b"))
        .select("a", "b"),
      col("a"), col("b"))
    // exact rescore: rejoin each side's distinct-gram ARRAY once per
    // candidate and intersect in a codegen'd expression. Joining the
    // arrays moves |candidates| bounded-size rows; the alternative —
    // exploding candidates by a's grams and equi-joining on (b, gram) —
    // shuffles |candidates|·|grams per doc| rows through two extra
    // aggregation stages (measured 9–13 s → ~5 s on the sf0.1 bench).
    candidates
      .join(shingled.select(col("id").as("a"), col("sh").as("sa")), "a")
      .join(shingled.select(col("id").as("b"), col("sh").as("sb")), "b")
      .withColumn("shared", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("shared").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }
}
