package graft

// TEMPORARY optimization-round scratch tool - not part of the library.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = Bench.cfg("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Bench.cfg("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.linkage.{Clustering, PersonMatching}

    def timed(label: String)(f: => Unit): Unit = {
      graft.core.SessionHygiene.releaseAll(spark)
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val cfg = Clustering.ClusterConfig(cutoff = 99.0)
    for (r <- 1 to 2) {
      val corpus = graft.queries.Linkage.doubledCorpus(spark, sfDir)
      timed(s"r$r corpus count")(corpus.write.format("noop").mode("overwrite").save())
      timed(s"r$r scoredEdges") {
        Clustering.scoredEdges(corpus, cfg).write.format("noop").mode("overwrite").save()
      }
      timed(s"r$r edges+CC") {
        val edges = Clustering.scoredEdges(corpus, cfg).select("a", "b")
        Clustering.connectedComponents(corpus.select("id"), edges)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"r$r full cluster()") {
        Clustering.cluster(corpus, cfg).write.format("noop").mode("overwrite").save()
      }
      timed(s"r$r q23 query") {
        SparkEntry.queries("q23_person_clustering")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"r$r q60 query") {
        SparkEntry.queries("q60_cluster_tools_matrix")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
