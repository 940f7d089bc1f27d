package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that make these plans survive a
  * 100× scale-up, asserted so regressions fail loudly.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filters and projections reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), "filter pushdown missing")
    assert(p.contains("o_orderstatus"), "predicate should reach the scan")
    // projection pruning: the scan must not read o_orderpriority
    assert(p.split("ReadSchema").last.contains("o_orderkey"))
    assert(!p.split("ReadSchema").last.contains("o_orderpriority"),
      "scan reads a column the query never uses")
  }

  test("aggregations run partial (map-side) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), "hash aggregation expected")
    assert(p.contains("partial_"), "map-side partial aggregation expected")
  }

  test("no cartesian products or nested-loop joins anywhere in the registry") {
    for (name <- SparkEntry.queries.keys.toSeq.sorted
         if name != "q23_person_clustering") { // iterative; planned per stage
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin") || name == "q30_cosine_topk",
        s"$name plans a nested-loop join")
    }
  }

  test("the blocked fuzzy join shuffles on bucket keys, not on rows") {
    val p = plan("q22_person_match_self")
    assert(p.contains("hashpartitioning"), "bucket equi-join should hash-partition")
    assert(!p.contains("CartesianProduct"))
  }

  test("candidate generation is bounded: degenerate buckets cannot go quadratic") {
    // a corpus where EVERY row lands in one composite bucket — with the
    // cap at k, the candidate set must be ≤ k², never n²
    import org.apache.spark.sql.functions.lit
    import graft.linkage.PersonMatching
    val session = spark
    import session.implicits._
    val n = 60
    val degenerate = (1L to n.toLong).map(i => (i, "erika", "schmidt"))
      .toDF("id", "strGName_processed", "strLName_processed")
    val src = degenerate.withColumnRenamed("id", "srcID")
    val trg = degenerate.withColumnRenamed("id", "trgID")
    val k = 7
    val capped = PersonMatching.scoredPairs(src, trg,
      PersonMatching.MatchConfig(minScore = 0.0, maxBucketSize = k), lit(true)).count()
    assert(capped === (k.toLong * k),
      s"cap $k must bound candidates at k², got $capped (n² would be ${n * n})")
  }

  test("date normalization stays in a codegen'd projection chain") {
    // execute so AQE materializes the final plan (codegen markers only
    // exist per finalized stage)
    val df = SparkEntry.queries("q18_date_parse_buckets")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators in the
    // compact plan rendering
    assert(p.contains("*(1)"), "date chain fell out of codegen")
  }
}
