package graft.sources

import java.net.URI
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object-store access (SURVEY S5; reference notebook GCS staging in
  * `scripts/etl-container/01_unpacking.ipynb`: blob upload/download +
  * table reads from bucket URLs).
  *
  * Everything goes through the Hadoop `FileSystem` connector API — the
  * interface `s3a://`, `gs://` and `abfs://` implementations plug into.
  * The scheme is chosen by the URI alone; no code changes between a
  * local `file://` path and a cloud bucket, only cluster configuration
  * (connector jar + credentials). Tests exercise the same code path via
  * `file://`, which is the honest local equivalent (this environment has
  * zero egress).
  */
object ObjectStore {

  private def fs(spark: SparkSession, uri: String): FileSystem =
    FileSystem.get(new URI(uri), spark.sparkContext.hadoopConfiguration)

  /** Blob upload (`bucket.blob(...).upload_from_*` in the reference). */
  def put(spark: SparkSession, uri: String, bytes: Array[Byte]): Unit = {
    val out = fs(spark, uri).create(new Path(uri), true)
    try out.write(bytes) finally out.close()
  }

  /** Blob download (`blob.download_as_bytes`). */
  def get(spark: SparkSession, uri: String): Array[Byte] = {
    val in = fs(spark, uri).open(new Path(uri))
    try in.readAllBytes() finally in.close()
  }

  def exists(spark: SparkSession, uri: String): Boolean =
    fs(spark, uri).exists(new Path(uri))

  def delete(spark: SparkSession, uri: String): Boolean =
    fs(spark, uri).delete(new Path(uri), true)

  /** List objects under a prefix (`bucket.list_blobs(prefix=...)`). */
  def list(spark: SparkSession, uri: String): Seq[String] = {
    val f = fs(spark, uri)
    val p = new Path(uri)
    if (!f.exists(p)) Nil
    else f.listStatus(p).map(_.getPath.toString).toSeq.sorted
  }

  /** Distributed table scan straight off the store URI — the parquet
    * reader streams ranges through the same connector, so executors pull
    * their own splits concurrently (no driver-side staging).
    */
  def readParquet(spark: SparkSession, uri: String): DataFrame =
    spark.read.parquet(uri)

  def writeParquet(df: DataFrame, uri: String): Unit =
    df.write.mode("overwrite").parquet(uri)
}
