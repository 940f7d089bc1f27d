package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `events` loader must accept BOTH corpus generations the driver
  * has shipped — `ts` as parquet TIMESTAMP(NANOS) (reads as a long
  * under `nanosAsLong`, floor-converted to microseconds) and as
  * TIMESTAMP(MICROS) (reads natively as TIMESTAMP_NTZ, cast under the
  * UTC session). The micros generation is what's on disk today, so the
  * nanos branch would otherwise be dead, untested code until the
  * corpus flips back — these fixtures pin both branches to the same
  * UTC instants.
  */
class TablesSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft_tables_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // 2001-02-03T04:05:06.007008 UTC, expressed in micros since epoch
  private val micros = 981173106007008L

  test("events: micros-NTZ generation loads as a UTC session timestamp") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.core.Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === micros)
  }

  test("events: nanos generation floor-converts to the same microsecond, pre-1970 included") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    // nanosAsLong surfaces TIMESTAMP(NANOS) as a raw long; writing the
    // long directly exercises the identical loader branch. 999 ns of
    // sub-micro detail must FLOOR (DuckDB's conversion), also for a
    // negative pre-1970 value where truncation toward zero would round
    // the wrong way.
    val nanos = Seq(
      (1L, micros * 1000L + 999L), // floors down to `micros`
      (2L, -1500L))                // 1969-12-31T23:59:59.999998Z, floor(-1.5 us) = -2
    nanos.toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.core.Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(micros, -2L))
  }

  test("events: a plain-INT64-micros corpus fails loudly instead of floor-dividing 1000x wrong") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    // a third corpus generation writing raw micros as un-annotated
    // int64 surfaces as LongType exactly like the nanos generation;
    // magnitude is the only tell (micros for 2001 ~ 9.8e14, nanos
    // ~ 9.8e17), and the loader must refuse rather than guess
    Seq((1L, micros)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](graft.core.Tables.events(spark, dir))
    assert(e.getMessage.contains("too small to be nanoseconds"))
    // failure must NOT memoize: a second load attempt re-fails loudly
    intercept[IllegalStateException](graft.core.Tables.events(spark, dir))
  }

  test("events: a corpus regenerated at the same path re-verifies instead of riding the stale memo") {
    val session = spark
    import session.implicits._
    val dir = tmpDir()
    // generation 1: genuine nanos — passes the magnitude check and
    // memoizes its fingerprint
    Seq((1L, micros * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(graft.core.Tables.events(spark, dir).count() === 1L)
    // generation 2, SAME path: plain-INT64 micros. A path-keyed memo
    // (the pre-r13 behavior) would skip the check and floor-divide
    // 1000x wrong silently; the fingerprint (part names/length/mtime
    // change on rewrite) must force re-verification and fail loudly
    Seq((1L, micros)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](graft.core.Tables.events(spark, dir))
    assert(e.getMessage.contains("too small to be nanoseconds"))
  }

  test("fingerprint: a single-file corpus rewritten in place with equal length and mtime still changes identity") {
    // the directory shape is safe by construction (Spark part names are
    // UUIDs), but a single-FILE events.parquet (test/tool pattern) can
    // be rewritten to the same byte length within the filesystem's
    // mtime granularity — name:length:mtime collide, and only the
    // content CRC separates the generations. Construct that exact
    // collision: same name, same length, mtime forced equal.
    val dir = tmpDir()
    val f = new java.io.File(s"$dir/events.parquet")
    Files.write(f.toPath, Array.fill[Byte](16384)(1))
    val mtime = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    Files.setLastModifiedTime(f.toPath, mtime)
    val fp1 = graft.core.Tables.eventsFingerprint(dir)
    // rewrite: identical length, different bytes (head AND tail differ,
    // as a parquet footer-stats shift would), mtime pinned back
    Files.write(f.toPath, Array.fill[Byte](16384)(2))
    Files.setLastModifiedTime(f.toPath, mtime)
    val fp2 = graft.core.Tables.eventsFingerprint(dir)
    assert(fp1 !== fp2,
      "equal-length same-mtime rewrite must change the fingerprint (content CRC)")
    // and identical content reproduces the identity (memo stability)
    Files.write(f.toPath, Array.fill[Byte](16384)(2))
    Files.setLastModifiedTime(f.toPath, mtime)
    assert(graft.core.Tables.eventsFingerprint(dir) === fp2)
  }

  test("events: the legacy nanos flag is scoped to the read, and the frame still executes after restore") {
    val session = spark
    import session.implicits._
    // effective value before (the conf has a registered default, so
    // getOption never reads None — compare effective values instead)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    assert(before === "false")
    val dir = tmpDir()
    Seq((1L, micros * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.core.Tables.events(spark, dir)
    // the shared session conf must NOT keep the legacy flag after the
    // call — an unrelated parquet read in a long-lived session would
    // silently surface TIMESTAMP(NANOS) columns as LongType
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === before,
      "events() must restore the session conf it changed")
    // and the returned frame still executes correctly AFTER the restore
    // (the flag was consumed at planning): pins that the scoping is safe
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) === micros)
  }

  test("events: a REAL TIMESTAMP(NANOS)-annotated corpus loads AND executes after the conf restore") {
    // the other nanos fixtures write plain un-annotated INT64 (Spark
    // cannot write TIMESTAMP(NANOS)), which never consults the legacy
    // flag — this pyarrow-written fixture carries the actual NANOS
    // annotation, so it exercises the real flag-consuming read path:
    // schema dispatch sees LongType only under nanosAsLong, and the
    // action below runs AFTER events() restored the session conf,
    // pinning that the flag is captured into the scan at planning
    // (restore-then-execute is safe) rather than re-read live.
    val dir = tmpDir()
    val pdir = new java.io.File(s"$dir/events.parquet")
    pdir.mkdirs()
    val in = getClass.getResourceAsStream(
      "/graftfixtures/nanos_events/events.parquet/part-0.parquet")
    assert(in != null, "nanos fixture missing from test resources")
    try java.nio.file.Files.copy(in, new java.io.File(pdir, "part-0.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val out = graft.core.Tables.events(spark, dir)
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "false",
      "conf must be restored before the frame is consumed")
    assert(out.schema("ts").dataType === TimestampType)
    // 981173106007008999 ns floors to ...07008 us
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) === micros)
  }

  test("events: the on-disk corpus loads through the dispatch with a timestamp ts") {
    val out = graft.core.Tables.events(spark, sf)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.limit(1).count() === 1L)
  }
}
