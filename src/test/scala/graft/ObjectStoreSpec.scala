package graft

import graft.sources.ObjectStore

/** S5 object-store semantics through the Hadoop FileSystem connector
  * API, exercised via the `file://` scheme (the cloud schemes differ
  * only in configuration, not code path).
  */
class ObjectStoreSpec extends SparkSpec {
  private val base = "file://" +
    java.nio.file.Files.createTempDirectory("graft_store").toString

  test("blob put/get/list/delete round trip") {
    val uri = s"$base/stage/blob1.bin"
    val payload = Array.tabulate[Byte](1000)(_.toByte)
    ObjectStore.put(spark, uri, payload)
    assert(ObjectStore.exists(spark, uri))
    assert(ObjectStore.get(spark, uri).toSeq === payload.toSeq)
    ObjectStore.put(spark, s"$base/stage/blob2.bin", Array[Byte](1, 2))
    val listed = ObjectStore.list(spark, s"$base/stage")
    assert(listed.size === 2 && listed.forall(_.contains("/stage/blob")))
    assert(ObjectStore.delete(spark, uri))
    assert(!ObjectStore.exists(spark, uri))
  }

  test("distributed parquet scan straight off the store URI") {
    val uri = s"$base/tables/nation"
    val nation = graft.core.Tables.nation(spark, sf)
    ObjectStore.writeParquet(nation, uri)
    val back = ObjectStore.readParquet(spark, uri)
    assert(back.count() === nation.count())
    assert(back.columns.sorted.toSeq === nation.columns.sorted.toSeq)
    // multiple part files — the scan is split-parallel, not a single blob
    assert(ObjectStore.list(spark, uri).exists(_.contains("part-")))
  }
}
