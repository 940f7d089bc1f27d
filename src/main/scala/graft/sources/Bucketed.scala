package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout (SURVEY §6 scale notes): pre-shuffling a fact
  * table into N buckets on its join key turns every subsequent equi-join
  * or aggregation on that key into a shuffle-FREE, co-located operation —
  * the write pays the shuffle once, every downstream pass skips it. This
  * is the 100 TB answer to "the same join key is used by every stage":
  * persist the partitioning, don't recompute it per query.
  *
  * Uses the session catalog's parquet bucketing (no Hive dependency);
  * `sortBy` on the same key additionally enables sort-merge joins with
  * no per-task sort.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted parquet table. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
