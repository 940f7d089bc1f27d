package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Query registry is assembled from per-domain modules; each module pairs
  * the Spark implementation with a DuckDB oracle where the semantics are
  * ANSI-SQL-expressible (non-expressible operators are registered without
  * an oracle → the driver records a rows-only check).
  */
object SparkEntry {
  private def modules: Seq[Q] = {
    val all = Relational.defs ++ Pipeline.defs ++ Normalization.defs ++ Linkage.defs ++ LlmData.defs
    // loud, not last-wins: .toMap below would silently keep one of two
    // same-named queries, dropping the other from bench AND correctness
    // coverage with nothing failing anywhere (the compact-key collision
    // in Bench has the same guard for the same reason)
    val dups = all.map(_.name).groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names across modules: ${dups.toSeq.sorted}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Run one logical job, then release graft's leftover checkpoint
    * blocks — the long-lived-session wrapper (notebook, query server,
    * any loop driving [[queries]] in one SparkSession). The similarity
    * family `localCheckpoint`s intermediates whose blocks outlive the
    * returned DataFrame; across many queries in one session they
    * accumulate until later jobs pay block-manager eviction churn
    * (measured ~2× on an identical run at the end of a 49-query
    * session — [[graft.core.SessionHygiene]] has the numbers, including
    * why the release is blocking rather than async: an async unpersist
    * made q27's next runs swing 9.0–19.0 s vs a stable 6.2 s). The
    * release is scoped to graft-created blocks; session state the
    * caller persisted is untouched.
    *
    * `body` must CONSUME its result (write/collect/count) before
    * returning: a lazy DataFrame escaping the block would re-execute
    * after its checkpoints are gone — the one contract violation
    * SessionHygiene cannot survive.
    *
    * One logical job at a time per session: the tracked-checkpoint set
    * is session-global, so two CONCURRENT `withHygiene` blocks in one
    * SparkSession would release each other's live checkpoints (see
    * [[graft.core.SessionHygiene.releaseLeftovers]]'s concurrency
    * contract). Serialize graft jobs, or give concurrent tenants their
    * own sessions.
    *
    * {{{
    * val n = SparkEntry.withHygiene(spark) {
    *   SparkEntry.queries("q22_person_match_self")(spark, dir).count()
    * }
    * }}}
    */
  def withHygiene[A](spark: SparkSession)(body: => A): A =
    try body
    finally {
      // guarded: a release-time throw in a finally would REPLACE the
      // body's in-flight exception (a stopped context after an executor
      // loss being the classic case), masking the root cause the caller
      // actually needs to see
      // NonFatal only: when the BODY succeeded, a fatal release error
      // (OOM, LinkageError) must still propagate — swallowing it would
      // let the caller continue in a corrupted JVM with later failures
      // detached from the real cause
      try graft.core.SessionHygiene.releaseLeftovers(spark)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] withHygiene release error (non-fatal): ${e.getMessage}")
      }
      ()
    }
}
