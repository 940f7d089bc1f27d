package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.linkage.PersonMatching
import graft.linkage.PersonMatching.MatchConfig

/** Record-linkage operators as driver queries (SURVEY J5/A7/E9/W1). */
object Linkage {

  /** Person table synthesized from `part`: first two name words as
    * given/last name, size as birth year, part key as prisoner number.
    * Restricted to rows whose name words are bucketable (≥2 chars).
    */
  private def persons(spark: SparkSession, dir: String): DataFrame =
    graft.core.ScaleKnob.sample(Tables.part(spark, dir), "p_partkey")
      .select(col("p_partkey").as("pid"),
        split(col("p_name"), " ").getItem(0).as("strGName_processed"),
        split(col("p_name"), " ").getItem(1).as("strLName_processed"),
        concat(lit("19"), lpad(col("p_size").cast("string"), 2, "0"), lit("0101"))
          .as("strDoB_processed"),
        lower(col("p_brand")).as("strPoB_processed"),
        col("p_partkey").cast("string").as("prisoner_number"))
      .filter(length(col("strGName_processed")) >= 2 && length(col("strLName_processed")) >= 2)

  /** J5 self-match: the blocked fuzzy join over the synthesized persons,
    * top-1 per source. The oracle is exact: every source's best match is
    * itself at score 100 (the unique prisoner number breaks any name tie
    * below 100), which cross-checks blocking, scoring and the top-k
    * window end to end.
    */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    val p = persons(spark, dir)
    val m = PersonMatching.personMatching(
      p.withColumnRenamed("pid", "srcID"),
      p.withColumnRenamed("pid", "trgID"),
      // self-match: symmetric kernels run once per unordered pair
      MatchConfig(topN = 1, minScore = 80.0, selfJoinMirror = true))
    // round the reported score (FP: 2/3·s + 1/3·s lands at 99.99999…);
    // ranking inside the window used the raw value
    m.withColumn("score", round(col("score"), 6)).orderBy(col("srcID"))
  }
  private val q22Sql =
    """SELECT p_partkey AS srcID, CAST(100.0 AS DOUBLE) AS score, p_partkey AS trgID
      |FROM part
      |WHERE length(split_part(p_name, ' ', 1)) >= 2
      |  AND length(split_part(p_name, ' ', 2)) >= 2
      |ORDER BY srcID""".stripMargin

  /** The doubled-transcription corpus for clustering: distinct persons
    * (both name words ≥ 4 chars, deduped on name+DoB), each emitted twice
    * with fresh ids — a transcription pair per entity.
    *
    * The construction makes the expected clustering PROVABLE at cutoff
    * 99: an exact twin scores ≈100 (all fields equal), while any cross
    * pair is bounded below 99 — same (g,l) pairs differ in DoB (year diff
    * ≥ 1 ⇒ date ≤ 96) and prisoner id (distinct integers ⇒ indel ratio
    * ≤ 1 − 1/(len_a+len_b) ≤ 93.3 at these id widths), so score ≤
    * 3/4·(2/3·100 + 1/3·(93.3+96)/2) + 1/4·100 ≈ 98.4; different (g,l)
    * pairs have primary ≤ 70 over this vocabulary. The ≥4-char filter
    * keeps every word bucketable at the clustering `idxChars = 4` (a
    * 3-char word produces no replay bucket and would orphan its twin).
    */
  // private[graft]: Bench's cluster_demo re-runs the exact q23 corpus
  // with ccAlgorithm varied (label-vs-star real-corpus A/B)
  private[graft] def doubledCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = persons(spark, dir)
      .filter(length(col("strGName_processed")) >= 4 && length(col("strLName_processed")) >= 4)
      .dropDuplicates("strGName_processed", "strLName_processed", "strDoB_processed")
    base.select((col("pid") * 2).as("id"), col("strGName_processed"),
        col("strLName_processed"), col("strDoB_processed"), col("strPoB_processed"),
        col("prisoner_number"))
      .unionByName(base.select((col("pid") * 2 + 1).as("id"), col("strGName_processed"),
        col("strLName_processed"), col("strDoB_processed"), col("strPoB_processed"),
        col("prisoner_number")))
  }

  /** Construction oracle shared by q23/q34: every cluster has exactly the
    * 2 transcriptions of one entity, so the size histogram is one row —
    * (2, number of distinct base persons) — which DuckDB derives straight
    * from `part`.
    */
  private val clusterHistogramSql =
    """SELECT CAST(2 AS BIGINT) AS cluster_size, COUNT(*) AS n_clusters
      |FROM (
      |  SELECT DISTINCT split_part(p_name, ' ', 1) AS g,
      |         split_part(p_name, ' ', 2) AS l, p_size
      |  FROM part
      |  WHERE length(split_part(p_name, ' ', 1)) >= 4
      |    AND length(split_part(p_name, ' ', 2)) >= 4)""".stripMargin

  /** E10–E12: agglomerative clustering over the doubled corpus — blocked
    * scored edges → connected components → exact greedy replay — emitted
    * as the cluster-size histogram the construction pins to one row.
    *
    * Determinism-cost A/B (round 6, sf0.1 local[32]): round 5's recorded
    * q23 7.5 s / q34 4.9 s "regression" vs round 4 (4.8/3.7) was
    * single-shot noise — measured best-of-2 under the round-6 protocol
    * q23 = 5.0 s, q34 = 3.67 s, i.e. parity with round 4. The
    * deterministic-label work costs nothing measurable here (its extra
    * aggregate lives in mergeClusterings, which is not on the q23/q34
    * path at all).
    */
  private def q23(spark: SparkSession, dir: String): DataFrame =
    graft.linkage.Clustering.cluster(doubledCorpus(spark, dir),
        graft.linkage.Clustering.ClusterConfig(cutoff = 99.0))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  /** E8 exercised end to end: the same corpus pre-clustered via
    * MinHash-LSH candidates (collision shingles → banded signature
    * buckets) instead of prefix buckets, scored with the same
    * person-similarity cutoff, components emitted as the same histogram.
    * Exact twins have identical shingle sets ⇒ identical signatures ⇒
    * guaranteed candidates, so the construction oracle carries over.
    */
  private def q34(spark: SparkSession, dir: String): DataFrame = {
    val doubled = doubledCorpus(spark, dir)
    val cands = graft.linkage.Clustering.minHashCandidates(doubled)
    val scored = PersonMatching.scorePairs(
      cands.select(col("a").as("srcID"), col("b").as("trgID")),
      doubled.withColumnRenamed("id", "srcID"),
      doubled.withColumnRenamed("id", "trgID"),
      MatchConfig(minScore = 99.0))
    graft.linkage.Clustering
      .connectedComponents(doubled.select("id"),
        scored.select(col("srcID").as("a"), col("trgID").as("b")))
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  val defs: Seq[Q] = Seq(
    Q("q22_person_match_self", q22, Some(q22Sql)),
    Q("q23_person_clustering", q23, Some(clusterHistogramSql)),
    Q("q34_minhash_preclustering", q34, Some(clusterHistogramSql)))
}
