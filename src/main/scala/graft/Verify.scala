package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // silence the per-RDD unpersist warning from the job-boundary
    // hygiene below — same rationale as Bench.main
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (same semantics as Bench): tokens match a
    // query when they equal its name or its qNN prefix. The driver never
    // sets this, so driver runs always dump the full registry.
    val only = Bench.onlyConfigured()
    val selected = SparkEntry.queries.filter { case (name, _) =>
      Bench.onlySelects(only, name)
    }
    if (only.isDefined && selected.isEmpty) {
      System.err.println(s"[verify] SPARK_GRAFT_ONLY matched no query")
      sys.exit(1)
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // the gate (tools/check.py) scans stdout AND stderr for
        // "[verify] <name> failed" (regex-anchored on the marker, since
        // sbt's forked-run logger prefixes lines) and takes <name> as
        // the crashed query — this is the ONE message shape that may
        // use that wording
        println(s"[verify] $name failed: ${e.getMessage}")
      }
      // r19 forensics (the q63 incident: one driver-side hash_match
      // false no local rerun could reproduce): for SMALL results, leave
      // a canonical text rendering beside the parquet — column-name-
      // sorted, row-sorted, unit-separator-joined — so a future mismatch
      // in the driver's window is a visible diff, not an opaque hash.
      // Reads back the just-written parquet (no recompute). Errors here
      // are non-fatal and the "[verify-canon]" marker can never match
      // the gate's "[verify] <name> failed" failure scanner.
      try {
        val canonCap = 5000
        // a STALE sidecar from an earlier run must never outlive the
        // parquet it describes: if this run's result exceeds the cap
        // (or the canon step throws below), leftover forensics would
        // misrepresent the current result - delete first, write after
        Files.deleteIfExists(Paths.get(s"$outDir/$name.canon.txt"))
        val back = spark.read.parquet(s"$outDir/$name")
        val cols = back.columns.sorted
        val rows = back.select(cols.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
          .limit(canonCap + 1).collect()
        // TZ-STABLE rendering: java.sql.Timestamp.toString formats in
        // the JVM default zone, so the same parquet would canon
        // differently on a UTC driver box vs a zoned local box -
        // exactly the cross-host diff this sidecar exists for.
        // Timestamps render as their UTC instant instead.
        def render(v: Any): String = v match {
          case null                  => "NULL"
          case t: java.sql.Timestamp => t.toInstant.toString
          case other                 => other.toString
        }
        if (rows.length <= canonCap) {
          val lines = rows.map(r => cols.indices.map(i => render(r.get(i)))
            .mkString("")).sorted
          Files.writeString(Paths.get(s"$outDir/$name.canon.txt"),
            lines.mkString("", "\n", "\n"))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify-canon] $name sidecar skipped (non-fatal): ${e.getMessage}")
      }
      // job-boundary hygiene: checkpoint blocks from one query are dead
      // weight for the next (see core.SessionHygiene) — without this the
      // 49-query dump accumulates them for the whole pass. releaseAll:
      // Verify owns this session, same rationale as Bench.
      try graft.core.SessionHygiene.releaseAll(spark)
      catch { case e: Throwable =>
        // wording matters: the gate's failure scanner selects lines
        // containing the exact "[verify]" marker, then regex-extracts
        // "[verify] <name> failed" — this message's "[verify-hygiene]"
        // marker never matches the substring filter, so a hygiene
        // hiccup stays a warning no scanner can mistake for a query
        // failure
        System.err.println(s"[verify-hygiene] leftover release error (non-fatal): ${e.getMessage}")
      }
    }
    // JSON string escape: one implementation for the whole package —
    // Bench.jstr handles backslash, quote, and ALL control chars (its
    // \uXXXX form for \n/\r/\t is byte-equivalent JSON to the
    // shorthands); a second hand-rolled copy here would drift
    def q(s: String): String = "\"" + Bench.jstr(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Current query-name list, so the local harness can ignore stale
    // result dirs from since-removed queries.
    Files.writeString(Paths.get(s"$outDir/query_names.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
