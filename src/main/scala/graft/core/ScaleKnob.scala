package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bench-only corpus scaling for growth measurements.
  *
  * `frac` is read from the JVM property `graft.bench.scale.frac`
  * (default 1.0). At 1.0 — every driver, Verify, and test run — the
  * sampling helpers return their input untouched, so plans and oracle
  * results are bit-identical to a build without this knob. The Bench
  * scaling pass sets 0.5 to time the similarity family on half the
  * corpus and report cost growth per data-doubling.
  *
  * `docsCap` (property `graft.bench.docs.cap`, default 2500) bounds the
  * synthetic dedup demo corpus; the Bench scaling pass lifts it to 5000
  * so the capped dedup family sees real corpus growth. Default keeps
  * every oracle bit-identical to the hardcoded literal it replaced.
  *
  * Both properties are validated once at first read and fail with a
  * message naming the property, instead of surfacing a
  * NumberFormatException (or a silently empty sample) deep inside plan
  * construction.
  */
object ScaleKnob {
  val Prop = "graft.bench.scale.frac"
  val DocsCapProp = "graft.bench.docs.cap"

  /** Bench-only UP-scaling (property `graft.bench.scale.replicate`,
    * default 1 = identity): replicate the corpus `n`× as n DISJOINT
    * SHARDS, so growth exponents can be measured past the biggest
    * on-disk scale factor. Construction per copy k:
    *
    *   - ids remap to `id·n + k` (globally unique, order-preserving);
    *   - string columns pass through a per-copy Caesar rotation of the
    *     LETTERS (`a..z`/`A..Z` shifted by k; digits, spaces and
    *     punctuation untouched);
    *   - float/double array columns (embeddings) rotate by k positions.
    *
    * Why this exact construction: each perturbation is a BIJECTION
    * applied uniformly within a copy, so every shard is isomorphic to
    * the base corpus — equal strings stay equal, n-gram/shingle
    * equality is preserved, array inner products are unchanged — and
    * the within-shard candidate structure of every blocked similarity
    * operator replicates exactly. ACROSS shards, name prefixes, grams
    * and LSH bands diverge (shifted letters / rotated vectors ≈
    * unrelated content), so shards behave like genuinely new data
    * rather than near-duplicates of the base: candidate pairs grow
    * ~n×, not n²×, which is how real corpora grow (new data is new
    * content — the near-dup RATE stays constant, the match graph does
    * not densify). Digit-only fields (dates, id numbers) stay valid
    * and identical across shards; cross-shard rows still never pair
    * unless they first meet in a (now-disjoint) letter/vector bucket.
    */
  val ReplicateProp = "graft.bench.scale.replicate"

  def frac: Double = sys.props.get(Prop) match {
    case None => 1.0
    case Some(raw) =>
      val v =
        try raw.toDouble
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$Prop must be a number in (0, 1], got '$raw'")
        }
      require(v > 0.0 && v <= 1.0, s"$Prop must be in (0, 1], got $raw")
      // the sampling threshold is round(frac*1000): anything below
      // 0.0005 rounds to 0 and keeps ZERO rows — the exact silently-
      // empty sample the validation exists to prevent
      require(math.round(v * 1000) >= 1,
        s"$Prop must be at least 0.0005 (threshold resolution is 1/1000), got $raw")
      v
  }

  def docsCap: Int = sys.props.get(DocsCapProp) match {
    case None => 2500
    case Some(raw) =>
      val v =
        try raw.toInt
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$DocsCapProp must be a positive integer, got '$raw'")
        }
      require(v > 0, s"$DocsCapProp must be a positive integer, got $raw")
      v
  }

  /** Upper bound 26, not an arbitrary cap: the Caesar alphabet has 26
    * rotations, so shard shifts k = 0..25 are pairwise distinct — at
    * k = 26 the rotation would wrap to identity and that shard's
    * strings would collide with the base shard's, quietly re-densifying
    * the buckets the disjoint construction exists to keep apart.
    */
  def replicate: Int = sys.props.get(ReplicateProp) match {
    case None => 1
    case Some(raw) =>
      val v =
        try raw.toInt
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$ReplicateProp must be an integer in [1, 26], got '$raw'")
        }
      require(v >= 1 && v <= 26,
        s"$ReplicateProp must be in [1, 26] (26 = distinct Caesar rotations), got $raw")
      v
  }

  /** Deterministic uniform sample: keeps rows with `id % 1000` below
    * `frac * 1000`. Identity when frac ≥ 1. When [[replicate]] is n > 1,
    * the (possibly sampled) corpus is expanded to n disjoint shards —
    * see [[ReplicateProp]] for the construction and why growth is ~n×.
    */
  def sample(df: DataFrame, idCol: String): DataFrame = {
    val base =
      if (frac >= 1.0) df
      else df.filter(pmod(col(idCol), lit(1000)) < math.round(frac * 1000).toInt)
    val n = replicate
    if (n <= 1) base
    else (0 until n).map(k => shard(base, idCol, k, n)).reduce(_.unionByName(_))
  }

  private val Letters = "abcdefghijklmnopqrstuvwxyz"

  private def rotated(alphabet: String, k: Int): String = {
    val s = k % alphabet.length
    alphabet.drop(s) + alphabet.take(s)
  }

  /** Copy k of n: id remap + per-copy letter Caesar + per-copy array
    * rotation, schema-driven so every table shape works unchanged.
    * Copy 0 keeps its content bit-identical to the base corpus (only
    * the id remap applies uniformly — ids must be globally unique and
    * keep their relative order across all shards).
    */
  private def shard(df: DataFrame, idCol: String, k: Int, n: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val out =
        // long domain before the multiply: an int id near Int.MaxValue/n
        // must widen, not wrap (all shards agree on the type, so
        // unionByName stays aligned)
        if (f.name == idCol) c.cast("long") * n + k
        else if (k == 0) c
        else f.dataType match {
          case StringType =>
            translate(c, Letters + Letters.toUpperCase(java.util.Locale.ROOT),
              rotated(Letters, k) + rotated(Letters.toUpperCase(java.util.Locale.ROOT), k))
          case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
            // rotate by k % dim positions (a rotation by dim is identity,
            // so the raw k would silently collapse shards k ≥ dim onto
            // shard 0); when the rotation wraps to 0 for k > 0, negate
            // instead — negation applied to BOTH vectors of a within-
            // shard pair preserves their inner product (D²=I), while
            // cross-shard cosines against unneg shards flip sign and
            // stop matching. The construction stays pairwise-disjoint
            // ONLY while every shard k ∈ [1, n-1] gets a distinct
            // (rotation, negated) signature: ANY two shards with
            // k ≡ k' (mod dim) apply the identical transform and carry
            // identical vectors (not just the wrapped-negated pair —
            // dim 4 at n = 6 collides shards 1 and 5 by plain
            // rotation). Distinctness needs n - 1 ≤ dim, so the guarded
            // raise_error fires on dim ≤ n - 2: a too-narrow corpus
            // fails loudly at execution instead of quietly
            // re-densifying the cross-shard buckets the construction
            // exists to keep disjoint (the same failure mode the
            // [1,26] replicate cap prevents for strings). Real
            // embedding widths (≥ 25 = max factor − 1) never fire it.
            // The guard covers TRANSFORM-level collisions only: distinct
            // signatures are necessary, not sufficient — a vector whose
            // CONTENT is itself rotation-symmetric (e.g. all-constant
            // values) yields identical shard vectors under distinct
            // rotations. That is a data property, not a construction
            // property, and stays unguarded (checking it would cost a
            // per-row O(dim²) symmetry test on a bench-only path).
            val dim = size(c)
            val r = pmod(lit(k), dim)
            val rot = concat(slice(c, r + 1, lit(1 << 24)), slice(c, lit(1), r))
            val shifted = when(r === 0, transform(c, x => -x)).otherwise(rot)
            val guarded = when(dim <= lit(n - 2), raise_error(concat(
              lit(s"$ReplicateProp=$n cannot keep array shards disjoint at dim="),
              dim.cast("string"),
              lit(": shards k = k' (mod dim) carry identical vectors; need dim >= replicate - 1"))))
              .otherwise(shifted)
            // NULL/empty arrays carry nothing to rotate and pass through
            // unchanged, as they did before the guard existed — without
            // the short-circuit, size(NULL)/size([]) would feed the dim
            // guard null/0 and raise a misleading "disjoint at dim=-1"-
            // style error instead of replicating the row
            when(c.isNull || size(c) === 0, c).otherwise(guarded)
          case _ => c
        }
      out.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }
}
