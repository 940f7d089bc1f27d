package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.SessionHygiene.TrackedCheckpoint

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * The self-join near-dup path `localCheckpoint`s its bucket table; in a
  * long-lived session, release it at job boundaries with
  * [[graft.core.SessionHygiene.releaseLeftovers]].
  *
  * Two paths:
  *  - [[cosineTopK]]: exact brute force for a SMALL query set — the
  *    queries are broadcast, the corpus is scanned once, the dot product
  *    is a codegen'd higher-order expression (`zip_with` + `aggregate`),
  *    and a window keeps the top-k per query. Cost O(|Q|·N); the scale
  *    path for a handful of probes.
  *  - [[lshCosineTopK]]: random-hyperplane LSH for query sets that are
  *    themselves large — signatures bucket both sides, candidates meet in
  *    a band equi-join and only bucket-mates are rescored exactly. Recall
  *    is tunable via bands × bits.
  */
object Ann {

  /** L2-normalize (double) an embedding column expression. An all-zero
    * vector passes through unchanged: 0/0 would fill it with NaN, and
    * NaN sorts as the LARGEST double in a descending rank — a zero
    * embedding must never outrank genuine neighbors.
    */
  def l2Normalize(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0d), (acc, x) => acc + x * x))
    when(norm === 0.0d, vec).otherwise(transform(vec, x => x / norm))
  }

  /** Cosine similarity between two (unnormalized) vector columns —
    * pure codegen'd higher-order functions, no UDF.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    // a zero vector is similar to NOTHING (score 0), never NaN: 0/0
    // NaN sorts as the largest double under orderBy(desc), so one
    // all-zero embedding would rank #1 against every query in the
    // exact, LSH, and IVF top-k paths alike
    val denom = na * nb
    // CORRUPT vectors (any NaN/Inf component — at 100 TB they exist)
    // are the same poisoning one step removed: denom === 0 is FALSE
    // for a NaN/Inf denom, the ratio reads NaN, and the corrupt row
    // ranks #1 for every query. Non-finite scores therefore collapse
    // to 0 (rank last, pair with nothing) exactly like zero vectors.
    // The guard tests DENOM, not the ratio: any non-finite component
    // necessarily drives a norm (hence denom) to NaN/+Inf, while two
    // finite vectors always yield a finite denom and a finite ratio —
    // and testing the ratio would re-evaluate the expensive
    // dot/denom aggregate once per CaseWhen reference (measured 2.1x
    // on q30 before this was restructured). sqrt keeps denom >= 0, so
    // NaN and +Inf are the only non-finite cases. The division stays
    // in the otherwise-branch: under ANSI mode (the Spark 4 default)
    // an unconditional zero division throws DIVIDE_BY_ZERO.
    when(denom === 0.0d || isnan(denom) || denom === Double.PositiveInfinity,
      lit(0.0d)).otherwise(dot / denom)
  }

  /** Exact top-k by cosine: broadcast the (small) query side, scan the
    * corpus once, rank per query. Returns (query_id, rank, id, score).
    */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
    // staged (r21): the |Q|·N cosine evaluations run in the broadcast
    // join's probe stage, which otherwise inherits the corpus scan's
    // parallelism — one task on bench-SF single-row-group parquet
    graft.core.Parallelism.staged(c, col("id")).join(broadcast(q))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "score")
  }

  final case class IvfConfig(
      nList: Int = 16, // number of inverted lists (centroids)
      nProbe: Int = 4, // centroid lists each query probes
      seed: Long = 42L)

  /** IVF (inverted-file) cosine top-k: a coarse quantizer assigns every
    * corpus vector to its nearest centroid (one scan, one shuffle on the
    * centroid id); each query probes only its `nProbe` nearest centroid
    * lists and rescores those exactly. Centroids are a deterministic
    * hash-spread sample of the corpus — at 100 TB the assignment is the
    * only full pass, and probe cost scales with `nProbe/nList` of the
    * data. Recall misses only when a neighbor's cell is not probed.
    */
  def ivfCosineTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, cfg: IvfConfig = IvfConfig(),
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // deterministic spread sample as centroids
    val centroids: Array[(Int, Seq[Double])] = corpus
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .withColumn("__h", abs(hash(col(idCol), lit(cfg.seed))))
      .orderBy(col("__h"))
      .limit(cfg.nList)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    val cB = centroids
    def cos(v: Seq[Double], c: Seq[Double]): Double = {
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * c(i); nv += v(i) * v(i); nc += c(i) * c(i); i += 1 }
      dot / math.sqrt(nv * nc + 1e-12)
    }
    val assignUdf = udf { (v: Seq[Double]) => cB.maxBy(c => cos(v, c._2))._1 }
    val nProbe = cfg.nProbe
    val probeUdf = udf { (v: Seq[Double]) =>
      cB.sortBy(c => -cos(v, c._2)).take(nProbe).map(_._1)
    }
    // staged (r21): the per-row centroid assignment (nList cosines/row)
    // otherwise runs at single-task scan parallelism at bench SFs
    val assigned = graft.core.Parallelism.staged(
        corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("cv")),
        col("id"))
      .withColumn("cell", assignUdf(col("cv")))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(probeUdf(col("qv"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
    probes.join(assigned, "cell")
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "score")
  }

  /** Embedding-cosine near-duplicate pairs (`a < b`, cosine ≥ threshold)
    * over LSH buckets — the dedup family's vector sibling.
    */
  def cosineNearDuplicates(
      df: DataFrame, threshold: Double, cfg: LshConfig = LshConfig(),
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // self-join: keep only the a<b orientation BEFORE the rescore joins —
    // each surviving pair is scored once, not in both orientations
    val matches = lshCosineTopK(df, df, k = Int.MaxValue, cfg, idCol, vecCol,
      candidatePredicate = col("query_id") < col("id"))
    matches.filter(col("score") >= threshold)
      .select(col("query_id").as("a"), col("id").as("b"), col("score"))
  }

  /** Deterministic Rademacher (±1) hyperplanes, entry `p,i` drawn from
    * the low bit of `md5("seed:p:i")`. Sign-random-projection theory
    * holds for any symmetric ±1 ensemble, and md5 is the one generator
    * both this engine and the DuckDB oracle evaluate identically — so
    * the whole ANN pipeline (projection, banding, candidate join, exact
    * rescore, ranking) is value-verifiable in SQL rather than rows-only.
    */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes)(p => Array.tabulate(dim)(i =>
      if ((Dedup.tokenHash64(s"$seed:$p:$i") & 1L) == 1L) 1.0 else -1.0))

  /** Per-JVM memo so the signature UDF can size the planes from the row's
    * own vector length — no driver-side `head()` job to learn the
    * dimension, and every executor derives the identical array from the
    * seed.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()
  private[text] def cachedPlanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, dim, seed), { k: (Int, Int, Long) =>
      hyperplanes(k._1, k._2, k._3)
    })

  /** Default tuned for moderate neighbors (θ ≈ 60°): collision per table
    * (1-θ/π)^bits ≈ 0.20, so 16 tables give ≈ 97% expected recall
    * (measured ≥ 0.9 on the synthetic corpus in TextOpsSpec). Tighter
    * neighbor structure (real embedding corpora) permits more bits per
    * table and fewer rescores.
    */
  final case class LshConfig(
      bits: Int = 4,
      tables: Int = 16,
      seed: Long = 42L)

  /** LSH bucketed cosine top-k: per table, the sign pattern of `bits`
    * hyperplane projections is the bucket key; both sides are exploded to
    * (table, bucket) and candidates meet in an equi-join, then rescored
    * exactly. Misses are possible (tunable recall), never false accepts.
    */
  def lshCosineTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, cfg: LshConfig = LshConfig(),
      idCol: String = "vec_id", vecCol: String = "embedding",
      candidatePredicate: Column = lit(true)): DataFrame = {
    val bits = cfg.bits
    val tables = cfg.tables
    val seed = cfg.seed
    val sigUdf = udf { (v: Seq[Double]) =>
      val planes = Ann.cachedPlanes(bits * tables, v.length, seed)
      (0 until tables).map { t =>
        var key = 0L
        var b = 0
        while (b < bits) {
          val p = planes(t * bits + b)
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += v(i) * p(i); i += 1 }
          if (dot >= 0) key |= (1L << b)
          b += 1
        }
        s"$t:$key"
      }
    }
    // bucket join carries IDS ONLY (same shape as the MinHash band join):
    // the candidate distinct runs over narrow pairs, and each side's
    // vector rejoins exactly once per surviving candidate instead of
    // riding through the explode ×tables
    def vecs(df: DataFrame, id: String) = df
      .select(col(idCol).as(id), col(vecCol).cast("array<double>").as(s"__v_$id"))
    // DEGENERATE vectors (zero, empty, or any null/NaN/Inf component) are
    // excluded BEFORE banding: every hyperplane dot reads NaN or 0, so
    // they ALL land in bucket "t:0" of every table — a corrupt-heavy
    // corpus would pair them quadratically in one hot bucket (the
    // blank-document minhash blowup, vector edition) only for the
    // rescore to zero every pair out (their cosine is DEFINED 0, which
    // can never reach a positive threshold or beat a genuine
    // neighbor). LSH contract unchanged: misses possible, never false
    // accepts. The exact cosineTopK path still scans and ranks them
    // (last, score 0).
    // x.isNull is spelled out even though three-valued logic would drop
    // null-bearing rows anyway (isnan(null) -> null -> filter false):
    // the exclusion is part of the contract (the DuckDB oracle replay
    // states `x IS NULL` explicitly), and a refactor to e.g. a forall
    // must not silently change it.
    def finiteNonZero(v: Column) =
      !exists(v, x => x.isNull || isnan(x) ||
        x === Double.PositiveInfinity || x === Double.NegativeInfinity) &&
        exists(v, x => x =!= 0.0d)
    // staged (r21): the signature UDF (tables×bits dot products per row)
    // otherwise runs at scan parallelism — one task on bench-SF
    // single-row-group parquet. Each side is consumed once (the band
    // join; the self-join path checkpoints), so the pinned exchange
    // materializes exactly one UDF pass.
    def withBuckets(df: DataFrame, id: String) = graft.core.Parallelism.staged(
        vecs(df, id).filter(finiteNonZero(col(s"__v_$id"))), col(id))
      .select(col(id), explode(sigUdf(col(s"__v_$id"))).as("bucket"))
    // SELF-JOIN fast path (cosineNearDuplicates passes the SAME frame on
    // both sides, by reference): the signature UDF — tables×bits dot
    // products per row — is the dominant per-row cost, and both join
    // sides need the identical (id, bucket) table. Materialize it once
    // (ids only, narrow — same discipline as the MinHash band join)
    // instead of running the UDF over the corpus twice; the differing
    // column aliases would otherwise defeat Spark's exchange reuse. The
    // checkpoint lives until the caller's job boundary
    // (core.SessionHygiene), like Dedup's shingled base.
    val (bucketsQ, bucketsC) =
      if (queries eq corpus) {
        val b = withBuckets(queries, "query_id").trackedCheckpoint()
        (b, b.toDF("id", "bucket"))
      } else
        (withBuckets(queries, "query_id"), withBuckets(corpus, "id"))
    // candidatePredicate prunes pairs before the distinct AND before the
    // vector rejoins — a self-join caller passes query_id < id here so
    // each pair is rescored in one orientation only
    // pinned width (r21): the exact-rescore stage (vector rejoins +
    // cosine) fuses after this dedup's final aggregate, and AQE
    // byte-coalescing otherwise shrinks it to a handful of tasks — see
    // [[graft.core.Parallelism.pinnedDistinct]]
    val candidates = graft.core.Parallelism.pinnedDistinct(
      bucketsQ
        .join(bucketsC, "bucket")
        .filter(candidatePredicate)
        .select(col("query_id"), col("id")),
      col("query_id"), col("id"))
    val scored = candidates
      .join(vecs(queries, "query_id"), "query_id")
      .join(vecs(corpus, "id"), "id")
      .withColumn("score", cosine(col("__v_query_id"), col("__v_id")))
    if (k == Int.MaxValue)
      scored.withColumn("rank", lit(0)).select("query_id", "rank", "id", "score")
    else {
      val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "rank", "id", "score")
    }
  }
}
