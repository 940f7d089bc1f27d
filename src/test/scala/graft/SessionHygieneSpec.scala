package graft

import graft.core.SessionHygiene

class SessionHygieneSpec extends SparkSpec {

  test("releaseLeftovers is scoped: drops graft-tracked checkpoints, leaves caller state alone") {
    val session = spark
    import session.implicits._
    // caller-owned state a shared-session embedder (notebook, query
    // server) might hold across the call — must survive untouched
    val callerHeld = (1 to 500).toDF("n").localCheckpoint()
    assert(callerHeld.count() === 500L)
    val graftCk = SessionHygiene.checkpoint((1 to 1000).toDF("m"))
    assert(graftCk.count() === 1000L)
    val released = SessionHygiene.releaseLeftovers(spark)
    assert(released >= 1)
    val live = spark.sparkContext.getPersistentRDDs.keySet
    // graft's blocks are gone; the caller's are still resident AND
    // still readable (a localCheckpoint cannot recompute, so surviving
    // the release is the whole point)
    assert(!SessionHygiene.checkpointRdds(graftCk).exists(r => live.contains(r.id)))
    assert(SessionHygiene.checkpointRdds(callerHeld).forall(r => live.contains(r.id)))
    assert(callerHeld.count() === 500L)
    SessionHygiene.releaseAll(spark)
  }

  test("releaseAll drops every persisted RDD, graft's or not, and reports the count") {
    val session = spark
    import session.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val ck = (1 to 1000).toDF("n").localCheckpoint()
    assert(ck.count() === 1000L)
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    val released = SessionHygiene.releaseAll(spark)
    assert(released >= 1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("Spark upgrade canary: localCheckpoint surfaces as execution.LogicalRDD (coupled to Spark 4.1.x)") {
    val session = spark
    import session.implicits._
    val ck = (1 to 10).toDF("n").localCheckpoint()
    val rdds = SessionHygiene.checkpointRdds(ck)
    // this must FAIL LOUDLY, never no-op: release/releaseLeftovers and
    // Clustering's eager per-iteration release all reach through this
    // match, and if a Spark upgrade changes the analyzed-plan shape they
    // would silently stop releasing anything (the long-session ~2x
    // slowdown would quietly return)
    assert(rdds.nonEmpty,
      "localCheckpoint's analyzed plan no longer contains an execution.LogicalRDD leaf — " +
        "SessionHygiene's block release silently no-ops on this Spark version; " +
        "re-derive the reach-in (SessionHygiene.checkpointRdds) before upgrading past 4.1.x")
    assert(rdds.forall(r => spark.sparkContext.getPersistentRDDs.contains(r.id)),
      "the LogicalRDD leaf exists but its RDD is not persisted — the localCheckpoint " +
        "block-ownership contract SessionHygiene relies on has changed")
    SessionHygiene.releaseAll(spark)
  }

  test("SparkEntry.withHygiene releases graft checkpoints once the body completes") {
    val session = spark
    import session.implicits._
    var ckId = -1
    val n = SparkEntry.withHygiene(spark) {
      val ck = SessionHygiene.checkpoint((1 to 300).toDF("n"))
      ckId = SessionHygiene.checkpointRdds(ck).head.id
      ck.count()
    }
    assert(n === 300L)
    assert(!spark.sparkContext.getPersistentRDDs.contains(ckId),
      "withHygiene did not release the job's checkpoint blocks")
  }

  test("operators rebuild their own checkpoints after a release (job-boundary contract)") {
    val session = spark
    import session.implicits._
    val docs = Seq.tabulate(40)(i => (i.toLong, s"alpha beta gamma delta token$i"))
      .toDF("doc_id", "text")
    def pairs() = graft.text.Dedup.minHashDuplicates(docs, "doc_id", "text").count()
    val first = pairs()
    // the operator checkpointed through the tracked path, so the SCOPED
    // release must see it
    assert(SessionHygiene.releaseLeftovers(spark) >= 1)
    // a fresh call re-checkpoints from scratch — same result, no
    // dependence on the released blocks
    assert(pairs() === first)
    SessionHygiene.releaseLeftovers(spark)
  }
}
