package graft

/** Smoke test for the bench HARNESS itself (not the timings): `sbt test`
  * never runs `graft.Bench`, so a harness regression — the round-6 class
  * of bug where best-of-N silently masked flaky failures, or a malformed
  * artifact line — would otherwise surface only in the driver's
  * 14-minute full pass. Runs the real `Bench.run` in-process against the
  * shared test session on one cheap query and asserts the output
  * contract: both JSON artifacts well-formed, the probe stats present
  * and sane, the timing positive, nothing failed.
  */
class BenchSmokeSpec extends SparkSpec {

  private def withProps(props: (String, String)*)(body: => Unit): Unit = {
    val saved = props.map { case (k, _) => k -> sys.props.get(k) }
    props.foreach { case (k, v) => sys.props(k) = v }
    try body
    finally saved.foreach {
      case (k, Some(v)) => sys.props(k) = v
      case (k, None)    => sys.props.remove(k)
    }
  }

  test("Bench.run: one-query smoke keeps the artifact contract") {
    withProps(
      "SPARK_GRAFT_ONLY" -> "q01",
      "SPARK_GRAFT_BEST_OF" -> "1",
      "SPARK_GRAFT_SCALING" -> "0") {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke.json")
        .fold(err => fail(s"Bench.run refused: $err"), identity)
      assert(res.failed.isEmpty)

      // both artifacts must parse as JSON (the driver consumes them raw)
      import org.apache.spark.sql.functions.{col, from_json, lit, schema_of_json}
      def parses(js: String): Unit = {
        val df = spark.range(1).select(
          from_json(lit(js), schema_of_json(lit(js))).as("j"))
        assert(df.select(col("j")).head().get(0) != null, s"unparseable: $js")
      }
      parses(res.compact)
      parses(res.full)

      // probe contract: stats present, ordered, strictly positive
      val probe = """"probe":\{"min":([0-9.]+),"med(?:ian)?":([0-9.]+),"max":([0-9.]+)""".r
      val m = probe.findFirstMatchIn(res.compact)
        .getOrElse(fail(s"no probe stats in compact line: ${res.compact}"))
      val (mn, md, mx) = (m.group(1).toDouble, m.group(2).toDouble, m.group(3).toDouble)
      assert(mn > 0 && mn <= md && md <= mx, s"probe stats out of order: $mn/$md/$mx")

      // the query's timing is recorded and positive in both artifacts —
      // compact keys are the qNN prefix (tail-budget economy, README),
      // the full artifact keeps full names
      assert(res.compact.contains("\"q01\":"))
      val best = """"q01_pricing_summary":\{"best_sec":([0-9.E-]+)""".r
      val b = best.findFirstMatchIn(res.full)
        .getOrElse(fail(s"no best_sec in full artifact")).group(1).toDouble
      assert(b > 0)

      // the retry gate's bookkeeping is always present (normally empty
      // list in the full artifact, a count in the compact line)
      assert(res.full.contains("\"contention_retries\":"))
      assert("""\"retried\":\d+""".r.findFirstIn(res.compact).isDefined, res.compact)

      // consistency self-repair + cold-start provenance: always present;
      // with no consistency flags total_best_known must EQUAL value
      val tbk = """"total_best_known":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full)
        .getOrElse(fail("no total_best_known in full artifact")).group(1).toDouble
      val tot = """"value":([0-9.E-]+)""".r.findFirstMatchIn(res.full)
        .getOrElse(fail("no value in full artifact")).group(1).toDouble
      assert(math.abs(tbk - tot) < 1e-9, s"no flags fired but total_best_known $tbk != value $tot")
      assert(res.compact.contains("\"total_best_known\":"))
      // schema marker for the r17 headline redefinition: `value` means
      // best-known exactly when value_def says so — artifacts without
      // the field predate the switch and carry the raw main-pass sum.
      // Cross-round tooling keys on this field; losing it would silently
      // mix the two metric definitions again (the r17 advice item).
      assert(res.full.contains(""""value_def":"best_known""""), res.full.take(200))
      assert(res.compact.contains(""""value_def":"best_known""""), res.compact.take(200))
      val warm = """"median_first_over_best":([0-9.]+)""".r
        .findFirstMatchIn(res.full)
        .getOrElse(fail("no warmup spread in full artifact")).group(1).toDouble
      assert(warm > 0, s"warmup median ratio must be positive: $warm")

      // settle probe: recorded per query, positive (it runs real work)
      val settle = """"probe_settle_sec":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full)
        .getOrElse(fail("no probe_settle_sec in full artifact")).group(1).toDouble
      assert(settle > 0, s"probe_settle_sec must be positive: $settle")

      // probe normalization: every query carries its bracketing-probe
      // median, and both artifacts carry the advisory normalized total
      val adj = """"probe_adjacent_sec":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full)
        .getOrElse(fail("no probe_adjacent_sec in full artifact")).group(1).toDouble
      assert(adj > 0, s"probe_adjacent_sec must be positive: $adj")
      val tpn = """"total_probe_normalized":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full)
        .getOrElse(fail("no total_probe_normalized in full artifact")).group(1).toDouble
      // single-query run: the advisory total IS best/adjacent (3-decimal
      // rounding in the artifact is the only slack)
      assert(tpn > 0 && math.abs(tpn - b / adj) < 0.01,
        s"normalized total $tpn inconsistent with best $b / adjacent $adj")
      assert("""\"tpn\":[0-9.]+""".r.findFirstIn(res.compact).isDefined,
        s"no tpn in compact line: ${res.compact}")
    }
  }

  test("Bench.run: q22 scaling block carries the per-candidate normalization (r18)") {
    // sec_per_million_candidates exists so the q22 wall-time growth
    // exponent can never be misread as kernel superlinearity: candidate
    // pairs grow ~4x for 2x rows on the duplicate-heavy corpus, so the
    // honest kernel number is wall time per CANDIDATE. The pin asserts
    // the division really is full_sec / candidate_pairs (per million),
    // i.e. the normalization can never silently drift from the two raw
    // fields it sits beside. Also covers the scaling pass end to end in
    // the suite (previously only the driver's full run exercised it) and
    // the r18 lcs_demo master-recording contract.
    withProps(
      "SPARK_GRAFT_ONLY" -> "q22",
      "SPARK_GRAFT_BEST_OF" -> "1",
      "SPARK_GRAFT_SCALING" -> "force",
      "SPARK_GRAFT_DRIFT_REPAIR_MAX" -> "0",
      "SPARK_GRAFT_LCS_DEMO_PAIRS" -> "8",
      "SPARK_GRAFT_LCS_DEMO_CHARS" -> "200") {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke_scaling.json")
        .fold(err => fail(s"Bench.run refused: $err"), identity)
      assert(res.failed.isEmpty)
      val pairsRe = """"candidate_pairs":\{"quarter":(-?\d+),"half":(-?\d+),"full":(-?\d+)\}""".r
      val pm = pairsRe.findFirstMatchIn(res.full)
        .getOrElse(fail(s"no candidate_pairs in scaling block: ${res.full}"))
      val fullPairs = pm.group(3).toLong
      assert(fullPairs > 0, s"no candidates counted at full corpus: ${pm.matched}")
      val normRe =
        """"sec_per_million_candidates":\{"quarter":([0-9.E-]+|null),"half":([0-9.E-]+|null),"full":([0-9.E-]+)\}""".r
      val nm = normRe.findFirstMatchIn(res.full)
        .getOrElse(fail(s"no sec_per_million_candidates in scaling block: ${res.full}"))
      val secRe =
        """"q22_person_match_self":\{"quarter_sec":([0-9.E-]+),"half_sec":([0-9.E-]+),"full_sec":([0-9.E-]+)""".r
      val sm = secRe.findFirstMatchIn(res.full)
        .getOrElse(fail(s"no q22 scaling times: ${res.full}"))
      val fullSec = sm.group(3).toDouble
      val expected = fullSec * 1e6 / fullPairs
      val got = nm.group(3).toDouble
      assert(math.abs(got - expected) < math.max(0.002, 0.01 * expected),
        s"full normalization $got != full_sec $fullSec * 1e6 / pairs $fullPairs = $expected")
      // the lcs_demo A/B is only meaningful on a local master (the
      // kernel switch is a driver-JVM volatile); the recorded master
      // makes that precondition auditable in every artifact
      val masterRe = """"lcs_demo":\{[^}]*"master":"local""".r
      assert(masterRe.findFirstIn(res.full).isDefined,
        s"lcs_demo must record the (local) master: ${res.full}")
    }
  }

  test("Bench.run: drift_vs_committed flags same-corpus movement and gates on corpus identity") {
    // hand-written "committed" artifact: q01's probe-normalized ratio is
    // pinned microscopic (best 0.001 s at probe median 1.0), so any real
    // measurement must read as a >=2x outlier — exercising the parse,
    // the per-query ratio, the provenance stamp, and the outlier list.
    // q99 is listed failed: a committed-side failure duration must be
    // refused as a reference, not just a current-side one
    def committed(sfField: String): String = {
      val f = java.io.File.createTempFile("graft_committed_", ".json")
      f.deleteOnExit()
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(s"""{"metric":"total","queries":{"q01_pricing_summary":{"best_sec":0.001},"q99_broken":{"best_sec":0.2}},"failed":["q99_broken"],"probe":{"median":1.0},"started_utc":"2026-01-02T03:04:05Z","sf":"$sfField"}""")
      finally w.close()
      f.getAbsolutePath
    }
    withProps(
      "SPARK_GRAFT_ONLY" -> "q01",
      "SPARK_GRAFT_BEST_OF" -> "1",
      "SPARK_GRAFT_SCALING" -> "0",
      "SPARK_GRAFT_BENCH_COMMITTED" -> committed(sf)) {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke_drift.json")
        .fold(err => fail(s"Bench.run refused: $err"), identity)
      val b = """"q01_pricing_summary":\{"best_sec":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full).getOrElse(fail("no best_sec")).group(1).toDouble
      // the drift block's own recorded snapshot median — the repair
      // pass adds probes AFTER the ratios are computed, so the probe
      // block's final median is NOT the normalizer the ratios used
      val med = """"run_probe_median":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full).getOrElse(fail("no run_probe_median")).group(1).toDouble
      val drift = """"drift_vs_committed":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full).getOrElse(fail(s"no per-query drift in: ${res.full}"))
        .group(1).toDouble
      // committed ratio is 0.001/1.0; run-wide medians normalize, and
      // 3-decimal artifact rounding is the only slack. Relative
      // tolerance: drift here is in the thousands
      assert(math.abs(drift - (b / med) / 0.001) < 0.01 * drift,
        s"drift $drift inconsistent with best $b / run median $med over committed 0.001")
      assert(drift >= 2.0, s"pinned-microscopic committed ratio must flag: $drift")
      assert(res.full.contains(""""outliers":{"q01_pricing_summary":"""),
        s"outlier list missing the flagged query: ${res.full}")
      assert(res.full.contains(""""committed_started_utc":"2026-01-02T03:04:05Z""""),
        s"drift block must stamp WHICH recording it referenced: ${res.full}")
      assert("""\"drift_outliers\":1""".r.findFirstIn(res.compact).isDefined,
        s"compact line must carry the outlier count: ${res.compact}")
      // SELF-REPAIR contract (r13): the flagged query got one
      // re-measure batch, listed in repairs[] with its pre-repair
      // ratio (over the best observation the run already held — equal
      // to the flagging ratio here, since no scaling pass ran), the
      // re-measured seconds, and the post-repair ratio; its best
      // feeds best_known_sec and total_best_known restates the
      // headline with it (min can only improve or hold)
      val rep = """"repairs":\[\{"query":"q01_pricing_summary","drift":([0-9.E-]+),"remeasured_sec":([0-9.E-]+),"best_known_sec":([0-9.E-]+),"drift_after":([0-9.E-]+)\}\]""".r
        .findFirstMatchIn(res.full)
        .getOrElse(fail(s"no repair entry for the flagged query: ${res.full}"))
      val (remeasured, bk) = (rep.group(2).toDouble, rep.group(3).toDouble)
      assert(remeasured > 0, "re-measured batch must record a positive time")
      assert(math.abs(bk - math.min(b, remeasured)) < 1e-9,
        s"best_known $bk must be min(best $b, remeasured $remeasured)")
      assert(res.full.contains(""""best_known_sec":""" + bk),
        s"repair must feed the query's best_known_sec: ${res.full}")
      val tbk = """"total_best_known":([0-9.E-]+)""".r
        .findFirstMatchIn(res.full).getOrElse(fail("no total_best_known")).group(1).toDouble
      assert(math.abs(tbk - bk) < 1e-9,
        s"single-query run: total_best_known $tbk must equal the repaired best $bk")
      assert("""\"drift_repaired\":1""".r.findFirstIn(res.compact).isDefined,
        s"compact line must carry the repair count: ${res.compact}")
      // HEADLINE = BEST-KNOWN (r17): the compact line's `value` and its
      // per-query map must carry the REPAIRED number — the r16 record
      // shipped a 3.12 s headline beside its own 0.668 s repair — with
      // the raw main-pass sum one field away as `value_raw`. Tolerance
      // 5e-4: the compact line rounds to 3 decimals.
      val headlineV = """"value":([0-9.E-]+)""".r
        .findFirstMatchIn(res.compact).getOrElse(fail("no value in compact")).group(1).toDouble
      assert(math.abs(headlineV - bk) < 5e-4,
        s"compact headline value $headlineV must be the repaired best-known $bk")
      val headlineRaw = """"value_raw":([0-9.E-]+)""".r
        .findFirstMatchIn(res.compact).getOrElse(fail("no value_raw in compact")).group(1).toDouble
      assert(math.abs(headlineRaw - b) < 5e-4,
        s"compact value_raw $headlineRaw must be the raw main best $b")
      val qMapV = """"queries":\{"q01":([0-9.E-]+)\}""".r
        .findFirstMatchIn(res.compact).getOrElse(fail(s"no compact queries map: ${res.compact}"))
        .group(1).toDouble
      assert(math.abs(qMapV - bk) < 5e-4,
        s"compact per-query map must carry best-known $bk, not raw $b (got $qMapV)")
    }
    // bounded: SPARK_GRAFT_DRIFT_REPAIR_MAX=0 disables the repair pass
    // while the flagging stays — the advisory check must never be able
    // to spend unbounded wall clock
    withProps(
      "SPARK_GRAFT_ONLY" -> "q01",
      "SPARK_GRAFT_BEST_OF" -> "1",
      "SPARK_GRAFT_SCALING" -> "0",
      "SPARK_GRAFT_DRIFT_REPAIR_MAX" -> "0",
      "SPARK_GRAFT_BENCH_COMMITTED" -> committed(sf)) {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke_drift0.json")
        .fold(err => fail(s"Bench.run refused: $err"), identity)
      assert("""\"drift_outliers\":1""".r.findFirstIn(res.compact).isDefined, res.compact)
      assert(res.full.contains(""""repairs":[]"""),
        s"repair cap 0 must leave the repairs array empty: ${res.full}")
      // the full artifact names the cap, so empty-because-disabled is
      // identifiable there too
      assert(res.full.contains(""""repair_max":0"""),
        s"drift block must record the repair cap: ${res.full}")
      // disabled pass reads null, not 0: 0 means "pass ran, every
      // outlier already had an in-family observation", which a
      // REPAIR_MAX=0 run cannot claim
      assert("""\"drift_repaired\":null""".r.findFirstIn(res.compact).isDefined, res.compact)
      // no repair, no scaling -> no second observation -> no best_known
      // entry, and total_best_known falls back to value
      assert(!res.full.contains(""""best_known_sec":"""),
        s"no repair ran, so no best_known_sec may appear: ${res.full}")
    }
    // corpus-identity gate: a committed artifact recorded at a DIFFERENT
    // sf is not a reference (q01 at sf0.001 vs sf0.1 would read as pure
    // drift) — the whole block must be null, and the compact count null
    // too ("didn't check" must never read as "checked, clean")
    withProps(
      "SPARK_GRAFT_ONLY" -> "q01",
      "SPARK_GRAFT_BEST_OF" -> "1",
      "SPARK_GRAFT_SCALING" -> "0",
      "SPARK_GRAFT_BENCH_COMMITTED" -> committed("/root/testdata/sf0.1")) {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke_drift2.json")
        .fold(err => fail(s"Bench.run refused: $err"), identity)
      assert(res.full.contains(""""drift_vs_committed":null"""),
        s"sf mismatch must disable drift: ${res.full}")
      assert("""\"drift_outliers\":null""".r.findFirstIn(res.compact).isDefined, res.compact)
      // same didn't-check discipline for the scaling-coupled counters:
      // SCALING=0 means the consistency cross-check and the scaling
      // retry gate never executed — null, never a "checked, clean" 0
      assert("""\"consistency_warnings\":null""".r.findFirstIn(res.compact).isDefined, res.compact)
      assert("""\"retried_scaling\":null""".r.findFirstIn(res.compact).isDefined, res.compact)
    }
  }

  test("Bench.run: a malformed committed reference warns and disables drift, never aborts the bench") {
    val f = java.io.File.createTempFile("graft_committed_bad_", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.println("""{not json at all""") finally w.close()
    withProps(
      "SPARK_GRAFT_ONLY" -> "q01",
      "SPARK_GRAFT_BEST_OF" -> "1",
      "SPARK_GRAFT_SCALING" -> "0",
      "SPARK_GRAFT_BENCH_COMMITTED" -> f.getAbsolutePath) {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke_drift3.json")
        .fold(err => fail(s"malformed committed reference aborted the bench: $err"), identity)
      assert(res.failed.isEmpty)
      assert(res.full.contains(""""drift_vs_committed":null"""),
        s"unparseable reference must disable drift: ${res.full}")
    }
  }

  test("jstr escapes quotes, backslashes and control chars so a hostile path cannot corrupt the artifact") {
    assert(Bench.jstr("""/tmp/ref"v1.json""") === """/tmp/ref\"v1.json""")
    assert(Bench.jstr("""C:\bench\ref.json""") === """C:\\bench\\ref.json""")
    // expected spelled with escaped backslashes: Scala 2 processes
    // \\uXXXX escapes even inside triple-quoted literals
    assert(Bench.jstr("a\nb\tc") === "a\\u000ab\\u0009c")
    assert(Bench.jstr("plain/path.json") === "plain/path.json")
    // round-trip through a real JSON parser: the escaped form embedded
    // in a document must parse back to the original string
    import org.json4s._
    for (s <- Seq("""/tmp/we"ird\path""", "new\nline", "plain")) {
      val doc = s"""{"p":"${Bench.jstr(s)}"}"""
      val parsed = org.json4s.jackson.JsonMethods.parse(doc) \ "p"
      assert(parsed === JString(s), s"round-trip failed for: $s")
    }
  }

  test("probeAdjacentSec is a true median: averages the two-probe case, middles three") {
    def qt(before: Double, after: Double, retry: Option[Double]) =
      Bench.QueryTiming("q", 1.0, Seq(1.0), before, 0.1, after, Seq.empty, None, retry)
    // two probes: the mean, NOT the hotter bracket (the committed-r11
    // review finding: s(size/2) on two elements silently takes the max)
    assert(qt(0.16, 0.08, None).probeAdjacentSec === 0.12)
    // three probes (retry fired): the middle value
    assert(qt(0.30, 0.08, Some(0.10)).probeAdjacentSec === 0.10)
  }

  test("the shared ONLY filter: qNN prefix matches, substrings do not, parse drops empties") {
    // one implementation serves Bench's three passes AND Verify — pin
    // its semantics once: full name or exact qNN prefix, never a
    // substring ("q2" must NOT select q22)
    val only = Bench.parseOnly(Some(" q22 , q01_pricing_summary ,, "))
    assert(only === Some(Set("q22", "q01_pricing_summary")))
    assert(Bench.onlySelects(only, "q22_person_match_self"))
    assert(Bench.onlySelects(only, "q01_pricing_summary"))
    assert(!Bench.onlySelects(only, "q02_filter_project"))
    assert(!Bench.onlySelects(Bench.parseOnly(Some("q2")), "q22_person_match_self"),
      "a bare substring token must not select by prefix-of-prefix")
    assert(Bench.onlySelects(None, "anything"), "no filter selects everything")
  }

  test("Bench.run: malformed integer knobs fall back to defaults instead of aborting the run") {
    withProps(
      "SPARK_GRAFT_ONLY" -> "q01",
      "SPARK_GRAFT_BEST_OF" -> "two",
      "SPARK_GRAFT_SCALING" -> "0") {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke_badknob.json")
      assert(res.isRight, s"malformed BEST_OF aborted the bench: $res")
      assert(res.exists(_.failed.isEmpty))
      assert(res.exists(_.full.contains("\"best_of\":2")), "did not fall back to the default best_of")
    }
  }

  test("Bench.run: unknown SPARK_GRAFT_ONLY filter is a refusal, not an empty pass") {
    withProps("SPARK_GRAFT_ONLY" -> "q99_nope", "SPARK_GRAFT_SCALING" -> "0") {
      val res = Bench.run(spark, sf, "/tmp/graft_bench_smoke.json")
      assert(res.isLeft)
      assert(res.left.exists(_.contains("matched no query")))
    }
  }
}
