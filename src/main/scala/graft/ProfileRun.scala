package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: run declared queries through the noop sink
  * with a stage-metrics listener attached, and print a per-stage table
  * (executor run time, shuffle read/write bytes, input bytes, task count)
  * so the expensive stage of a query is a measurement, not a guess. The
  * UI is disabled in the bench session, so this is the headless stand-in
  * for the Stages tab (guide §7.1).
  *
  * Usage: sbt "runMain graft.ProfileRun <query> [query ...]"
  */
object ProfileRun {
  private final class Agg {
    var runTimeMs = 0L
    var cpuTimeNs = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    var inputB = 0L
    var tasks = 0
    var fetchWaitMs = 0L
    var wallMs = 0L
    var name = ""
    var job = ""
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileRun <query> [query ...]")
    val sfDir = Bench.cfg("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Bench.cfg("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.concurrent.TrieMap.empty[Int, Agg]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        e.stageIds.foreach { sid =>
          stages.getOrElseUpdate(sid, new Agg).job = s"j${e.jobId}/$desc"
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val a = stages.getOrElseUpdate(e.stageId, new Agg)
        val m = e.taskMetrics
        if (m != null) a.synchronized {
          a.runTimeMs += m.executorRunTime
          a.cpuTimeNs += m.executorCpuTime
          a.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
          a.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
          a.inputB += m.inputMetrics.bytesRead
          a.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
          a.tasks += 1
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val a = stages.getOrElseUpdate(i.stageId, new Agg)
        a.synchronized {
          // the one-line callsite is usually an anonymous lambda; the
          // first graft frame in the long-form details is the real site
          val graftFrame = i.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileRun"))
            .map(_.trim.stripPrefix("at "))
          a.name = graftFrame.getOrElse(i.name.linesIterator.next())
          a.wallMs = (for {
            s <- i.submissionTime; c <- i.completionTime
          } yield c - s).getOrElse(0L)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")})"))
      // warmup run (codegen/JIT), then the measured run on a clean listener
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.core.SessionHygiene.releaseAll(spark)
      stages.clear()
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription("construct")
      val df = fn(spark, sfDir)
      spark.sparkContext.setJobDescription("execute")
      df.write.format("noop").mode("overwrite").save()
      spark.sparkContext.setJobDescription(null)
      val sec = (System.nanoTime() - t0) / 1e9
      graft.core.SessionHygiene.releaseAll(spark)
      // give the listener bus a moment to drain
      Thread.sleep(500)
      println(f"\n=== $q : ${sec}%.3f s (run 2 of 2) ===")
      println(f"${"stage"}%7s ${"wall_ms"}%8s ${"run_ms"}%9s ${"cpu_ms"}%9s ${"fetch_ms"}%8s " +
        f"${"shR_MB"}%8s ${"shW_MB"}%8s ${"in_MB"}%7s ${"tasks"}%5s  name")
      val rows = stages.toSeq.sortBy(_._1)
      rows.foreach { case (id, a) =>
        println(f"$id%7d ${a.wallMs}%8d ${a.runTimeMs}%9d ${a.cpuTimeNs / 1000000}%9d " +
          f"${a.fetchWaitMs}%8d ${a.shuffleReadB / 1e6}%8.1f ${a.shuffleWriteB / 1e6}%8.1f " +
          f"${a.inputB / 1e6}%7.1f ${a.tasks}%5d ${a.job}%14s  ${a.name.take(55)}")
      }
      val totRun = rows.map(_._2.runTimeMs).sum
      val totWall = rows.map(_._2.wallMs).sum
      println(f"  total: run_ms=$totRun wall_ms_sum=$totWall stages=${rows.size}")
    }
    spark.stop()
  }
}
