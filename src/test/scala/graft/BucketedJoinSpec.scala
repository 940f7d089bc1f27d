package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** Co-located join via bucketed tables: the shuffle is paid once at
  * write time; the join plan itself must contain NO shuffle exchange on
  * either side. (Broadcast disabled for the assertion — broadcasting
  * would hide the property being tested.)
  */
class BucketedJoinSpec extends SparkSpec {

  test("join on the bucket key plans without a shuffle and matches the plain join") {
    val l = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
    Bucketed.writeBucketed(l, "graft_lineitem_b", "l_orderkey", 8)
    Bucketed.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_orders_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.read(spark, "graft_lineitem_b")
        .join(Bucketed.read(spark, "graft_orders_b"), "l_orderkey")
      val expected = l
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .count()
      assert(joined.count() === expected)
      joined.collect() // finalize AQE stages before reading the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    }
  }

  test("aggregation on the bucket key is map-side only (no exchange)") {
    val l = graft.core.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Bucketed.writeBucketed(l, "graft_li_agg_b", "l_orderkey", 8)
    try {
      val agg = Bucketed.read(spark, "graft_li_agg_b")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_li_agg_b")
  }
}
