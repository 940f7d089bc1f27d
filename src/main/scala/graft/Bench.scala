package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: one JSON line with per-query wall seconds.
  *
  * Results are materialized through the noop sink (every column computed
  * and serialized, nothing written) rather than `count()` — under count
  * Catalyst prunes unreferenced projections and a query would be benched
  * cheaper than its real cost. Failures are recorded per query and make
  * the run exit non-zero instead of being silently swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-footer costs land here, not on
    // whichever query happens to run first. Goes through the typed
    // accessors — `events` is TIMESTAMP(NANOS) and a raw scan aborts,
    // leaving it cold and spamming the bench tail with task errors.
    graft.core.Tables.all(spark, sfDir).foreach { case (t, df) =>
      try df.count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup of $t failed: ${e.getMessage}")
      }
    }
    // local-iteration filter: SPARK_GRAFT_ONLY=q22,q23 times just those.
    // Tokens match a query when they equal its name or its qNN prefix
    // (the part before the first '_') — "q2" does NOT select q20–q29.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var failed = List.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(f => f.contains(name) || f.contains(name.takeWhile(_ != '_')))
      }
    if (only.isDefined && selected.isEmpty) {
      System.err.println(
        s"[bench] SPARK_GRAFT_ONLY=${sys.env("SPARK_GRAFT_ONLY")} matched no query " +
          s"(known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")})")
      spark.stop()
      sys.exit(1)
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Scale-growth measurement: the similarity family timed fresh at half
    // and full corpus (graft.bench.scale.frac), back to back in the same
    // warm JVM. ratio = full/half per data-doubling; near-linear plans
    // stay ≲ 2, quadratic blowups read ≈ 4. Untimed for `total`; skipped
    // under SPARK_GRAFT_ONLY or SPARK_GRAFT_SCALING=0.
    val scalingTargets = Seq("q22_person_match_self", "q23_person_clustering",
      "q25_minhash_dedup", "q27_ngram_jaccard_dedup", "q31_ann_lsh_topk",
      "q35_cosine_near_dup")
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0" && only.isEmpty
    val scalingJson =
      if (!doScaling) "null"
      else {
        val entries = scalingTargets.flatMap { name =>
          SparkEntry.queries.get(name).flatMap { fn =>
            def timeIt(): Double = {
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            // best of 2 per point: single-shot wall times at these sizes
            // swing with JIT/GC enough to flip a ratio by 2x
            def best2(): Double = math.min(timeIt(), timeIt())
            try {
              sys.props(graft.core.ScaleKnob.Prop) = "0.5"
              val tHalf = try best2() finally sys.props.remove(graft.core.ScaleKnob.Prop)
              val tFull = best2()
              val ratio = tFull / tHalf
              val exp = math.log(ratio) / math.log(2)
              Some(s""""$name":{"half_sec":$tHalf,"full_sec":$tFull,"ratio":$ratio,"growth_exponent":$exp}""")
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] scaling of $name failed: ${e.getMessage}")
                None
            }
          }
        }
        // q22 caveat: a SELF-match over a FIXED 8x8-word vocabulary is
        // intrinsically quadratic in corpus size (halving rows quarters
        // each bucket's pair count) — real name distributions grow the
        // vocabulary with the data, which is what keeps bucket sizes and
        // the ratio bounded; the hot-bucket cap guards the true worst case
        val note = "\"note\":\"q22 self-matches a fixed-vocabulary corpus: candidate pairs scale " +
          "quadratically with rows by construction (buckets densify, vocabulary does not grow); " +
          "bounded by maxBucketSize, see PersonMatching.capBuckets\""
        (entries :+ note).mkString("{", ",", "}")
      }

    // no-silent-caps: bounds that make a bench number stop tracking the
    // scale factor are declared in the result itself
    val caps = """{"documents_corpus":"doc_id < 2500 (q18c/q24-q27 demo corpus cap)"}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"caps":$caps,"scaling":$scalingJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
