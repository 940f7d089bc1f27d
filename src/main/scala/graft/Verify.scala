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
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(f => f.contains(name) || f.contains(name.takeWhile(_ != '_')))
    }
    if (only.isDefined && selected.isEmpty) {
      System.err.println(s"[verify] SPARK_GRAFT_ONLY matched no query")
      sys.exit(1)
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // stdout, not stderr: the local gate (tools/check.py) scans the
        // captured output for these lines to fail the crashed query
        println(s"[verify] $name failed: ${e.getMessage}")
      }
      // job-boundary hygiene: checkpoint blocks from one query are dead
      // weight for the next (see core.SessionHygiene) — without this the
      // 49-query dump accumulates them for the whole pass. releaseAll:
      // Verify owns this session, same rationale as Bench.
      try graft.core.SessionHygiene.releaseAll(spark)
      catch { case e: Throwable =>
        System.err.println(s"[verify] leftover release failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
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
