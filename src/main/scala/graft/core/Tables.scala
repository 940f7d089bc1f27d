package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All scans go through here so every query benefits from the same
  * source settings; the parquet reader gives Catalyst filter pushdown
  * and column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some corpus
    * generations (which Spark's vectorized reader rejects — read nanos
    * as long and floor-convert to microseconds) and as TIMESTAMP(MICROS)
    * in others (which reads natively as TIMESTAMP_NTZ). Dispatch on the
    * schema actually on disk so both generations load identically:
    * either way downstream sees a session-zone (UTC) microsecond
    * timestamp, matching DuckDB's µs TIMESTAMP value-for-value.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // The legacy flag is scoped to THIS read, not left set on the shared
    // session: a long-lived session (notebook, query server) must not
    // have unrelated parquet reads silently surface TIMESTAMP(NANOS)
    // columns as LongType because a Tables.events call ran earlier. The
    // flag is consumed at PLANNING (schema conversion is captured into
    // the scan's hadoopConf when the relation resolves, which the
    // schema dispatch below forces), so restoring it after the read
    // does not disturb later executions of the returned frame —
    // TablesSpec's nanos fixtures execute after restoration and pin
    // exactly that.
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out =
    try {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos generation — by ASSUMPTION: any int64 `ts` surfaces as
        // LongType under nanosAsLong, including a hypothetical corpus
        // that wrote plain INT64 micros, which this branch would
        // silently divide 1000x wrong. assertNanosMagnitude (one
        // column-max job, memoized per corpus fingerprint) turns that
        // silent corruption into a loud load failure.
        assertNanosMagnitude(raw, dir)
        // Floor division (via pmod), not `div`: `div`
        // truncates toward zero, which would round negative (pre-1970)
        // nanos to the wrong microsecond vs DuckDB's flooring conversion.
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        // micros-NTZ generation: under the UTC session zone this cast
        // reinterprets the naive value as the same UTC instant the nanos
        // path produced, so both generations hash identically.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        // a THIRD corpus generation would land here; an unconditional
        // cast would silently misinterpret it (e.g. an integer-seconds
        // column casts as seconds-since-epoch, off by 1e6 with no
        // error) — fail at load where the cause is visible
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected TIMESTAMP nanos-as-long, " +
            "TIMESTAMP, or TIMESTAMP_NTZ); teach Tables.events this corpus generation")
    }
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
    out
  }
  /** Corpus FINGERPRINTS (path + per-file name/length/mtime of the
    * events parquet) whose int64 `ts` passed the nanosecond-magnitude
    * check. Populated on success only, so a failed corpus re-checks
    * (and re-fails loudly) on every load attempt. Keyed on the
    * fingerprint, not the path alone: a corpus REGENERATED at the same
    * path within one JVM (a test rewriting a tmp dir from nanos to
    * plain-INT64 micros) changes its part files' length/mtime and so
    * re-verifies, instead of riding the stale memo into a silent
    * 1000x floor-division.
    */
  private val nanosVerified = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Cheap identity for the on-disk events table: sorted part-file
    * (name, length, lastModified) under `dir`/events.parquet. For a
    * non-local URI (no java.io visibility) this degrades to the path
    * alone, which restores the one-generation-per-path-per-JVM
    * assumption — acceptable: the regeneration-in-place case the
    * fingerprint exists for is a local-filesystem test pattern.
    *
    * The SINGLE-FILE shape (events.parquet as a file, a test/tool
    * pattern — a Spark write always produces a directory of
    * UUID-named parts, so a regeneration there always changes names)
    * additionally folds in a CRC32 of the head+tail 8 KiB:
    * name:length:mtime alone can collide on an in-place same-length
    * rewrite within the filesystem's mtime granularity (1-2 s on
    * ext3/FAT), and a parquet rewrite always moves bytes in the
    * footer (column min/max statistics live there — a nanos→micros
    * rewrite shifts every ts stat 1000x). Bounded 16 KiB read per
    * events() load; the directory shape stays stat-only.
    */
  private[graft] def eventsFingerprint(dir: String): String = {
    val root = new java.io.File(s"$dir/events.parquet")
    if (root.isFile) {
      val crc = new java.util.zip.CRC32()
      try {
        val raf = new java.io.RandomAccessFile(root, "r")
        try {
          val headLen = math.min(8192L, raf.length()).toInt
          val head = new Array[Byte](headLen)
          raf.readFully(head); crc.update(head)
          if (raf.length() > 8192L) {
            val tailStart = math.max(8192L, raf.length() - 8192L)
            raf.seek(tailStart)
            val tail = new Array[Byte]((raf.length() - tailStart).toInt)
            raf.readFully(tail); crc.update(tail)
          }
        } finally raf.close()
        s"$dir|${root.getName}:${root.length}:${root.lastModified}:${crc.getValue}"
      } catch { case _: java.io.IOException =>
        // unreadable-as-file (raced delete etc.): stat-only identity,
        // same degradation as the non-local case
        s"$dir|${root.getName}:${root.length}:${root.lastModified}"
      }
    } else {
      val parts = if (root.isDirectory) Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
                  else Seq.empty
      dir + "|" + parts.sortBy(_.getName)
        .map(p => s"${p.getName}:${p.length}:${p.lastModified}").mkString(",")
    }
  }

  /** Distinguishes a nanos int64 `ts` from a plain-INT64-micros one by
    * magnitude: nanos for any post-1971 instant exceed 3.15e16, while a
    * micros corpus would need dates past year ~2969 to reach that. One
    * `max(abs(ts))` job per corpus fingerprint per JVM (memoized); an
    * all-pre-1971 corpus would false-trip, but the error names the
    * heuristic so that corpus is a quick diagnosis, where silent
    * 1000x-off timestamps are not. Empty/all-NULL corpora skip (nothing
    * to misinterpret).
    */
  private def assertNanosMagnitude(raw: DataFrame, dir: String): Unit = {
    val key = eventsFingerprint(dir)
    if (!nanosVerified.contains(key)) {
      import org.apache.spark.sql.functions.{abs, col, max}
      val m = raw.agg(max(abs(col("ts")))).head()
      if (!m.isNullAt(0) && m.getLong(0) < 31536000000000000L)
        throw new IllegalStateException(
          s"events.ts in $dir is int64 with max(abs(ts)) = ${m.getLong(0)} < 3.15e16: " +
            "values are too small to be nanoseconds (every post-1971 instant exceeds that) - " +
            "likely a plain INT64 micros corpus generation, which the nanos floor-division " +
            "would corrupt 1000x; teach Tables.events this corpus generation")
      nanosVerified.add(key)
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Every table through its typed accessor — `events` needs the
    * nanos-as-long path, so warmup/iteration code must come through here
    * rather than looping `table(...)` over [[names]]. Derived from
    * [[names]] so a new table can't be silently missing from warmup.
    */
  def all(spark: SparkSession, dir: String): Seq[(String, DataFrame)] =
    names.map { n =>
      n -> (if (n == "events") events(spark, dir) else table(spark, dir, n))
    }
}
