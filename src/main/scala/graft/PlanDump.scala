package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: write `.explain("formatted")` for each
  * declared query to `<outDir>/<query>.txt` so plan-shape claims
  * (Exchange count, join strategy, PushedFilters/ReadSchema) are
  * auditable files rather than prose. Same session shape as Bench
  * (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus) so the dumped
  * plan is the one the bench actually runs.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> [query ...]"
  * (no query args = every declared query; SPARK_GRAFT_SF_DIR picks the
  * corpus, default sf0.1 — plan shape is size-dependent under AQE only
  * at runtime, so the static plan is corpus-independent except for
  * scan paths/statistics.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [query ...]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val sfDir = Bench.cfg("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Bench.cfg("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted =
      if (args.length > 1) args.drop(1).toSet
      else SparkEntry.queries.keySet
    val unknown = wanted -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted(name)) {
        val txt =
          try {
            val df = fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch {
            case e: Throwable => s"PLAN FAILED: ${e.getMessage}"
          } finally graft.core.SessionHygiene.releaseAll(spark)
        Files.write(outDir.resolve(s"$name.txt"),
          txt.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"[plandump] wrote $name (${txt.linesIterator.size} lines)")
      }
    }
    spark.stop()
  }
}
