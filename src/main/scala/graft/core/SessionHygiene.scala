package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}

/** Long-lived-session hygiene for the checkpointing operators.
  *
  * The similarity/clustering/dedup family (`linkage.PersonMatching`,
  * `linkage.Clustering`, `text.Dedup`, `text.Ann`) and the two-pass
  * normalizers use `localCheckpoint()` to cap lineage on iterated or
  * reused intermediates. Those checkpoint blocks are owned by the
  * SparkSession, not the returned DataFrame: they stay resident in the
  * block manager until the driver GCs the RDD reference and the
  * ContextCleaner gets around to removal. A short-lived job never
  * notices — the session exits first. A LONG-lived session (a notebook,
  * a query server, a benchmark loop) accumulates dead checkpoint blocks,
  * and later queries pay block-manager eviction churn: measured on this
  * corpus, an identical person-match run reads ~2× slower at the end of a
  * 49-query session than in a fresh one, with quiet CPU both times.
  *
  * Call [[releaseLeftovers]] between logical jobs — i.e. at any point
  * where no returned DataFrame from a previous query will be re-executed.
  * It is SCOPED: every graft checkpoint site registers its RDD id here
  * (via [[checkpoint]]), and the release drops exactly those — caches
  * and localCheckpoints the embedding application created itself are
  * left alone, so calling it inside a notebook that holds its own
  * persisted state is safe. It is deliberately BLOCKING: an async
  * unpersist queues removal work that competes with whatever runs next,
  * which just moves the tax (measured in the bench: q27 best-of runs
  * [9.0, 19.0, 7.7] s with async release vs a stable 6.2 s without).
  *
  * [[releaseAll]] is the session-wide variant — every persisted RDD and
  * the whole Dataset cache, graft's or not. Only for a caller that OWNS
  * the session (graft's Bench and Verify mains use it for maximal
  * run-to-run isolation); in a shared session it makes any caller-held
  * localCheckpoint irrecoverable.
  *
  * Safety contract: every operator in this library rebuilds its plan
  * (and re-checkpoints) on each call — no operator hands out a DataFrame
  * whose correctness depends on a previous call's persisted blocks. The
  * one thing the caller must NOT do is hold a DataFrame from before the
  * release and re-run it EXPECTING the checkpoint to still be warm; it
  * will fail (a localCheckpoint cannot recompute — its lineage is
  * truncated by design). Release at job boundaries, not mid-pipeline.
  */
object SessionHygiene {

  /** RDD ids persisted by graft's own checkpoint sites and not yet
    * released. Ids only (no RDD references): holding the RDDs here would
    * defeat the ContextCleaner for any frame the caller drops.
    */
  private val tracked = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** `ds.localCheckpoint()` + registration with the scoped release.
    * Every `localCheckpoint` in graft code goes through here (grep-able
    * as `.trackedCheckpoint()`), which is what makes [[releaseLeftovers]]
    * exact: tracked ids = all graft-persisted state, nothing else.
    */
  def checkpoint[T](ds: Dataset[T]): Dataset[T] = {
    val cp = ds.localCheckpoint()
    checkpointRdds(cp).foreach(r => tracked.add(r.id))
    cp
  }

  /** Chaining syntax for [[checkpoint]]:
    * `df.filter(...).trackedCheckpoint()`.
    */
  implicit final class TrackedCheckpoint[T](private val ds: Dataset[T]) extends AnyVal {
    def trackedCheckpoint(): Dataset[T] = SessionHygiene.checkpoint(ds)
  }

  /** The checkpointed RDDs behind a frame's `LogicalRDD` leaves — the
    * blocks `Dataset.unpersist` cannot reach (it only drops
    * InMemoryRelation caches).
    *
    * SPARK-VERSION COUPLING (built against Spark 4.1.2): a
    * `localCheckpoint`'ed Dataset's analyzed plan is an
    * `execution.LogicalRDD` leaf holding the persisted RDD. That is an
    * internal class, not API; if an upgrade changes the plan shape this
    * match finds nothing and every release here silently no-ops —
    * SessionHygieneSpec's "Spark upgrade canary" test fails loudly on
    * exactly that condition, so bump Spark with that spec green.
    */
  private[graft] def checkpointRdds(ds: Dataset[_]): Seq[RDD[_]] =
    ds.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Blocking release of ONE frame's checkpoint blocks (no-op for any
    * non-checkpointed plan) — for operators that drop per-iteration
    * checkpoints eagerly mid-job. The frame must never be re-executed
    * afterwards.
    */
  def release(ds: Dataset[_]): Unit =
    checkpointRdds(ds).foreach { r =>
      r.unpersist(blocking = true)
      tracked.remove(r.id)
      ()
    }

  /** Scoped release: drop graft-created checkpoint leftovers, and ONLY
    * those. Blocking; returns the number of RDDs released.
    *
    * CONCURRENCY CONTRACT: one logical job at a time per session. The
    * tracked set is session-global, so in a session running graft jobs
    * CONCURRENTLY (a multi-tenant query server), one request's release
    * would unpersist another in-flight request's live checkpoints —
    * serialize jobs, or release only at points where no graft query is
    * mid-flight. (Caller-owned persisted state is safe either way; the
    * scoping protects it, not concurrent graft jobs.)
    */
  def releaseLeftovers(spark: SparkSession): Int = {
    // snapshot the tracked ids BEFORE reading the persistent map, and
    // filter BOTH paths against the snapshot: an id registered by a
    // concurrent checkpoint() after this point is never a stale-prune
    // candidate (it would look "not persisted yet" and be evicted while
    // live) and never a release candidate either (filtering against the
    // live set would unpersist a just-registered LIVE checkpoint, whose
    // truncated lineage makes its blocks the only copy)
    val knownBefore = new java.util.HashSet[Int](tracked)
    val persistent = spark.sparkContext.getPersistentRDDs
    val leftovers = persistent.values.filter(r => knownBefore.contains(r.id)).toSeq
    leftovers.foreach(_.unpersist(blocking = true))
    leftovers.foreach(r => tracked.remove(r.id))
    // ids already gone from the block manager (ContextCleaner beat us to
    // them) stay useless forever — drop them so the set stays bounded
    knownBefore.forEach { id =>
      if (!persistent.contains(id)) tracked.remove(id)
      ()
    }
    leftovers.size
  }

  /** Session-wide release: EVERY persisted RDD (checkpoint blocks
    * included, graft's or not) plus the whole Dataset cache. Only for a
    * caller that owns the session — see the class doc.
    */
  def releaseAll(spark: SparkSession): Int = {
    val leftovers = spark.sparkContext.getPersistentRDDs.values.toSeq
    leftovers.foreach(_.unpersist(blocking = true))
    // clear, don't remove-by-id: every persisted RDD is gone after this
    // call, so ANY tracked id is now dead — ids whose blocks the
    // ContextCleaner already removed are absent from getPersistentRDDs
    // and a remove-by-id loop would leak them into the set forever
    // under releaseAll-only usage (Bench/Verify's 49-query loops)
    tracked.clear()
    spark.catalog.clearCache()
    leftovers.size
  }
}
