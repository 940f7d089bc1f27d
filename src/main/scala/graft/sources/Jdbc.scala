package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC partitioned scan (SURVEY S4; reference
  * `scripts/dbquery-container/load_data.ipynb`).
  *
  * The reference fetches 1M-row batches in a manual loop; Spark's JDBC
  * source replaces that with `partitionColumn`/`numPartitions` bounds so
  * every executor pulls its own range concurrently and the memory
  * ceiling is per-partition, not per-driver. No database ships in this
  * environment, so this wrapper is exercised only through its plan
  * construction; the option mapping is the tested contract.
  */
object Jdbc {
  final case class JdbcScan(
      url: String,
      table: String, // table name or "(subquery) alias"
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int = 32,
      fetchSize: Int = 10000,
      properties: Map[String, String] = Map.empty)

  def read(spark: SparkSession, scan: JdbcScan): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", scan.url)
      .option("dbtable", scan.table)
      .option("partitionColumn", scan.partitionColumn)
      .option("lowerBound", scan.lowerBound)
      .option("upperBound", scan.upperBound)
      .option("numPartitions", scan.numPartitions)
      .option("fetchsize", scan.fetchSize)
    scan.properties.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
