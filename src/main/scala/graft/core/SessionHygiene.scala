package graft.core

import org.apache.spark.sql.SparkSession

/** Long-lived-session hygiene for the checkpointing operators.
  *
  * The similarity/clustering/dedup family (`linkage.PersonMatching`,
  * `linkage.Clustering`, `text.Dedup`) uses `localCheckpoint()` to cap
  * lineage on iterated or reused intermediates. Those checkpoint blocks
  * are owned by the SparkSession, not the returned DataFrame: they stay
  * resident in the block manager until the driver GCs the RDD reference
  * and the ContextCleaner gets around to removal. A short-lived job never
  * notices — the session exits first. A LONG-lived session (a notebook,
  * a query server, a benchmark loop) accumulates dead checkpoint blocks,
  * and later queries pay block-manager eviction churn: measured on this
  * corpus, an identical person-match run reads ~2× slower at the end of a
  * 49-query session than in a fresh one, with quiet CPU both times.
  *
  * Call [[releaseLeftovers]] between logical jobs — i.e. at any point
  * where no returned DataFrame from a previous query will be re-executed.
  * It is deliberately BLOCKING: an async unpersist queues removal work
  * that competes with whatever runs next, which just moves the tax.
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

  /** Drop every persisted RDD (checkpoint blocks included) and clear the
    * Dataset cache. Blocking; returns the number of RDDs released.
    */
  def releaseLeftovers(spark: SparkSession): Int = {
    val leftovers = spark.sparkContext.getPersistentRDDs.values.toSeq
    leftovers.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    leftovers.size
  }
}
