package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: per-query wall seconds.
  *
  * Results are materialized through the noop sink (every column computed
  * and serialized, nothing written) rather than `count()` — under count
  * Catalyst prunes unreferenced projections and a query would be benched
  * cheaper than its real cost. Failures are recorded per query and make
  * the run exit non-zero instead of being silently swallowed.
  *
  * Output protocol (the driver archives only the last ~2000 chars of
  * stdout, and round 5 learned the hard way that one long line gets cut
  * mid-map, losing the total):
  *   - the FULL result JSON — precise timings, every main-pass run,
  *     scaling details, caps — is written to a file
  *     (SPARK_GRAFT_BENCH_FULL, default BENCH_FULL.json in cwd);
  *   - stdout's LAST line is a compact summary (3-decimal timings,
  *     exponents only for scaling) sized to survive the tail capture,
  *     with a pointer to the full file.
  *
  * Main-pass timings are best-of-2 (SPARK_GRAFT_BEST_OF to override) so
  * a noisy sandbox neighbor can't fake an 8× regression — the scaling
  * pass already measured that single-shot times swing enough to flip a
  * ratio by 2×.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bestOf = sys.env.getOrElse("SPARK_GRAFT_BEST_OF", "2").toInt.max(1)
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
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
    // main pass: best-of-N; all runs of a query recorded in the full file
    val results = selected.map { case (name, fn) =>
      def once(): Either[Double, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Left((System.nanoTime() - t0) / 1e9)
        }
      }
      val runs = (1 to bestOf).map(_ => once())
      val ok = runs.collect { case Right(t) => t }
      if (ok.isEmpty) failed ::= name
      val best = if (ok.nonEmpty) ok.min else runs.collect { case Left(t) => t }.max
      (name, best, runs.map(_.merge))
    }
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Scale-growth measurement: similarity + dedup families timed fresh at
    // half and full corpus, back to back in the same warm JVM. The capped
    // dedup trio runs with graft.bench.docs.cap=5000 so "full" means 5000
    // docs, not the 2500 main-pass cap — the only way those queries ever
    // see corpus growth. ratio = full/half per data-doubling; near-linear
    // plans stay ≲ 2, quadratic blowups read ≈ 4. Untimed for `total`;
    // skipped under SPARK_GRAFT_ONLY or SPARK_GRAFT_SCALING=0.
    val scalingTargets = Seq("q22_person_match_self", "q23_person_clustering",
      "q25_minhash_dedup", "q27_ngram_jaccard_dedup", "q31_ann_lsh_topk",
      "q35_cosine_near_dup")
    val liftedCapTargets = Seq("q24_exact_dedup", "q26_simhash_dedup",
      "q34_minhash_preclustering")
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0" && only.isEmpty
    val scaling: Seq[(String, Double, Double)] =
      if (!doScaling) Seq.empty
      else (scalingTargets.map((_, false)) ++ liftedCapTargets.map((_, true)))
        .flatMap { case (name, liftCap) =>
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
              if (liftCap) sys.props(graft.core.ScaleKnob.DocsCapProp) = "5000"
              try {
                sys.props(graft.core.ScaleKnob.Prop) = "0.5"
                val tHalf = try best2() finally sys.props.remove(graft.core.ScaleKnob.Prop)
                val tFull = best2()
                Some((name, tHalf, tFull))
              } finally if (liftCap) sys.props.remove(graft.core.ScaleKnob.DocsCapProp)
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] scaling of $name failed: ${e.getMessage}")
                None
            }
          }
        }
    def exp(half: Double, full: Double): Double = math.log(full / half) / math.log(2)

    // ---- full JSON to file: precise values, all runs, notes, caps ----
    // q22 caveat: a SELF-match over a FIXED 8x8-word vocabulary is
    // intrinsically quadratic in corpus size (halving rows quarters
    // each bucket's pair count) — real name distributions grow the
    // vocabulary with the data, which is what keeps bucket sizes and
    // the ratio bounded; the hot-bucket cap guards the true worst case
    val note = "q22 self-matches a fixed-vocabulary corpus: candidate pairs scale " +
      "quadratically with rows by construction (buckets densify, vocabulary does not grow); " +
      "bounded by maxBucketSize, see PersonMatching.capBuckets"
    val caps = """{"documents_corpus":"doc_id < 2500 in the main pass (q18c/q24-q27 demo corpus); scaling pass lifts to 5000 for q24/q26/q34"}"""
    val qsFull = results.map { case (k, best, runs) =>
      "\"" + k + "\":{\"best_sec\":" + best + ",\"runs\":" + runs.mkString("[", ",", "]") + "}"
    }.mkString("{", ",", "}")
    val scalingFull =
      if (scaling.isEmpty) "null"
      else scaling.map { case (n, h, f) =>
        s""""$n":{"half_sec":$h,"full_sec":$f,"ratio":${f / h},"growth_exponent":${exp(h, f)}}"""
      }.mkString("{", ",", s""","note":"$note"}""")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","best_of":$bestOf,"queries":$qsFull,"failed":$failedJson,"caps":$caps,"scaling":$scalingFull,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter(fullPath, "UTF-8")
      try w.println(fullJson) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}")
    }

    // ---- compact summary as the LAST stdout line (~1500 chars) ----
    def f3(d: Double): String = f"$d%.3f"
    val qsCompact = results.map { case (k, best, _) => "\"" + k + "\":" + f3(best) }
      .mkString("{", ",", "}")
    val scalingCompact =
      if (scaling.isEmpty) "null"
      else scaling.map { case (n, h, f) =>
        "\"" + n.takeWhile(_ != '_') + "\":" + f3(exp(h, f))
      }.mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","best_of":$bestOf,"queries":$qsCompact,"failed":$failedJson,"growth_exponents":$scalingCompact,"full":"$fullPath","sf":"$sfDir"}"""
    // the driver's tail capture is ~2000 chars; if this ever outgrows it,
    // drop the per-query map rather than let the line be cut mid-map
    if (compact.length <= 1900) println(compact)
    else {
      System.err.println(s"[bench] compact line ${compact.length} chars > 1900; emitting reduced line")
      println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","best_of":$bestOf,"failed":$failedJson,"full":"$fullPath","sf":"$sfDir"}""")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
