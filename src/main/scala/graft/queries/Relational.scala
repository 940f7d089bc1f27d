package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational operator coverage (SURVEY.md §2.1, §2.2, §2.5-§2.8).
  *
  * Every query is declared with the DataFrame API so Catalyst plans it:
  * filters/projections reach the parquet scan, small dimension sides are
  * broadcast, aggregates get map-side partial aggregation. Numeric sums
  * go through decimal so Spark and the DuckDB oracle agree bit-for-bit
  * (FP addition order differs between engines).
  *
  * Scale notes (100 TB):
  *  - group-bys here key on low-cardinality columns → partial agg shrinks
  *    shuffle traffic to O(groups × partitions);
  *  - top-k uses window + rank over a narrow projection, not a global sort;
  *  - dimension joins (region/nation/customer at TPC-H shape) are
  *    broadcast candidates and Spark's AQE will pick that up from stats.
  */
object Relational {
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary (A-family aggregation; SURVEY A3/A5/A9). */
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("decimal(28,4)"))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection pushed to the scan (SURVEY P1/P2). */
  private def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  private val q02Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 400000.0
      |ORDER BY o_orderkey""".stripMargin

  /** 3-way join + aggregation + deterministic top-10 (SURVEY J1/J2, A6, W2/W3).
    * No forced broadcast: at TPC-H shape the filtered customer side is
    * broadcast-sized and AQE picks that up from runtime stats; at 100×
    * the same hint would OOM, so the decision is left to the optimizer.
    */
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("decimal(28,4)"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }
  private val q03Sql =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Per-group top-k via window (SURVEY W1: best-k per partition key). */
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rank_in_segment", row_number().over(w))
      .filter(col("rank_in_segment") <= 3)
      .orderBy(col("c_mktsegment"), col("rank_in_segment"))
  }
  private val q04Sql =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rank_in_segment FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rank_in_segment
      |  FROM customer) t
      |WHERE rank_in_segment <= 3
      |ORDER BY c_mktsegment, rank_in_segment""".stripMargin

  /** Distinct projection (SURVEY P6 `drop_duplicates`). */
  private def q05(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  private val q05Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Row union (SURVEY U1 `pd.concat(axis="rows")` → unionByName). */
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).select(col("r_name").as("name"), lit("region").as("kind"))
    val n = Tables.nation(spark, dir).select(col("n_name").as("name"), lit("nation").as("kind"))
    r.unionByName(n).orderBy(col("kind"), col("name"))
  }
  private val q06Sql =
    """SELECT * FROM (
      |  SELECT r_name AS name, 'region' AS kind FROM region
      |  UNION ALL
      |  SELECT n_name AS name, 'nation' AS kind FROM nation) t
      |ORDER BY kind, name""".stripMargin

  /** Anti join (SURVEY J7: index difference → left_anti). */
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }
  private val q07Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join + count by segment (SURVEY U3 intersection semantics). */
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }
  private val q08Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Within-group running number (SURVEY A1/W5 `groupby.cumcount()+1`).
    * The window itself is the demoed operator; bounding the output to the
    * first 5 entries per user keeps the final global sort proportional to
    * the number of users, not the number of events — at 100 TB an
    * unreduced "window + global sort of the whole input" is a non-plan.
    */
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), row_number().over(w).as("entry_number"))
      .filter(col("entry_number") <= 5)
      .orderBy(col("user_id"), col("entry_number"))
  }
  private val q09Sql =
    """SELECT user_id, event_id, entry_number FROM (
      |  SELECT user_id, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS entry_number
      |  FROM events) t
      |WHERE entry_number <= 5
      |ORDER BY user_id, entry_number""".stripMargin

  /** Group-concat of deduped values (SURVEY A4/A8: `;`-join per group). */
  private def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("s_name"))), ";").as("supplier_names"),
        count(lit(1)).as("n_suppliers"))
      .orderBy(col("s_nationkey"))
  private val q10Sql =
    """SELECT s_nationkey,
      |  string_agg(DISTINCT s_name, ';' ORDER BY s_name) AS supplier_names,
      |  COUNT(*) AS n_suppliers
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** Global sort + limit (SURVEY W2/W3 `sort_values` / SQL TOP). */
  private def q11(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  private val q11Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Set algebra on key sets (SURVEY U3 index intersection/difference). */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
    f.intersect(p).orderBy(col("o_custkey"))
  }
  private val q12Sql =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin

  /** Boolean any() propagation per group (SURVEY A3/A10 QA-flag folding). */
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val perCust = o.groupBy(col("o_custkey"))
      .agg(max(when(col("o_totalprice") > 300000.0, 1).otherwise(0)).as("has_big_order"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("has_big_order")).cast("long").as("n_with_big_order"),
           count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }
  private val q13Sql =
    """SELECT c_mktsegment,
      |  CAST(SUM(CASE WHEN has_big_order THEN 1 ELSE 0 END) AS BIGINT) AS n_with_big_order,
      |  COUNT(*) AS n_customers
      |FROM customer
      |JOIN (SELECT o_custkey, bool_or(o_totalprice > 300000.0) AS has_big_order
      |      FROM orders GROUP BY o_custkey) t ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** JSON field extraction (SURVEY X1 surface: JSON blob → typed column). */
  private def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).cast("long").as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  private val q14Sql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Tumbling time-bucket aggregation (batch shape of SURVEY §2.12). */
  private def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // floor(), not a truncating cast: DuckDB `//` floors, so pre-1970
      // (negative-epoch) timestamps must land in the same bucket here.
      .select(floor(unix_timestamp(col("ts")).divide(3600)).cast("long").as("hour_bucket"),
        col("event_type"), col("value"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))
  private val q15Sql =
    """SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_bucket, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_bucket, event_type""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql)),
    Q("q02_filter_project", q02, Some(q02Sql)),
    Q("q03_join_topk_revenue", q03, Some(q03Sql)),
    Q("q04_window_topk", q04, Some(q04Sql)),
    Q("q05_distinct", q05, Some(q05Sql)),
    Q("q06_union_rows", q06, Some(q06Sql)),
    Q("q07_anti_join", q07, Some(q07Sql)),
    Q("q08_semi_join", q08, Some(q08Sql)),
    Q("q09_cumcount", q09, Some(q09Sql)),
    Q("q10_group_concat", q10, Some(q10Sql)),
    Q("q11_sort_limit", q11, Some(q11Sql)),
    Q("q12_set_intersect", q12, Some(q12Sql)),
    Q("q13_groupwise_any", q13, Some(q13Sql)),
    Q("q14_json_extract", q14, Some(q14Sql)),
    Q("q15_time_bucket_agg", q15, Some(q15Sql)))
}
