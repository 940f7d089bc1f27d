package graft

import graft.core.SessionHygiene

class SessionHygieneSpec extends SparkSpec {

  test("releaseLeftovers drops checkpoint blocks and reports the count") {
    val session = spark
    import session.implicits._
    // a localCheckpoint persists blocks the caller cannot reach through
    // the DataFrame API — exactly what the helper exists to release
    val before = spark.sparkContext.getPersistentRDDs.size
    val ck = (1 to 1000).toDF("n").localCheckpoint()
    assert(ck.count() === 1000L)
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    val released = SessionHygiene.releaseLeftovers(spark)
    assert(released >= 1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("operators rebuild their own checkpoints after a release (job-boundary contract)") {
    val session = spark
    import session.implicits._
    val docs = Seq.tabulate(40)(i => (i.toLong, s"alpha beta gamma delta token$i"))
      .toDF("doc_id", "text")
    def pairs() = graft.text.Dedup.minHashDuplicates(docs, "doc_id", "text").count()
    val first = pairs()
    SessionHygiene.releaseLeftovers(spark)
    // a fresh call re-checkpoints from scratch — same result, no
    // dependence on the released blocks
    assert(pairs() === first)
    SessionHygiene.releaseLeftovers(spark)
  }
}
