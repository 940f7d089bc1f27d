package graft

import org.apache.spark.sql.functions._

/** The q63-incident audit (round 19): CORRECTNESS_r18 recorded one
  * hash_match:false (q63) that no local rerun could reproduce, so every
  * `monotonically_increasing_id` site reachable from the query registry
  * was re-audited for partition/arrival-order sensitivity. Sites and
  * adjudication:
  *
  *  1. `core/Sentinels.scala` `RowId.withRowId` — NO live call site in
  *     main (utility with the documented shuffle precondition); grep
  *     re-verified this round.
  *  2. `consensus/EncDeduplicater.scala:171` — synthesizes row_id only
  *     when the caller supplies none. Both registry callers supply one
  *     (q17: the CSV index column; q63: o_orderkey), so the synthesized
  *     branch is OFF every gate path; the consensus frame is ALSO
  *     trackedCheckpoint-pinned against double evaluation.
  *  3. `unpack/Unpack.scala:117` — synthesized id drives only the
  *     WITHIN-SESSION two-pass consistency (discovery collect + output
  *     plan) over a deterministic scan lineage, and is dropped from the
  *     output when not supplied (line 198), so no cross-run value ever
  *     depends on it. q16 supplies a file-derived row_id; q39 does not
  *     and its output carries none.
  *  4. `linkage/Clustering.scala:590` (mergeClusterings) — explicitly
  *     non-deterministic and pinned with trackedCheckpoint before use;
  *     labels are then min-vid-canonicalized (q60's oracle hash-checks
  *     the result).
  *
  * The two executable pins below assert the layout-independence claims
  * for the two sites where a synthesized/explicit row_id meets an
  * order-sensitive kernel: the same input under different partition
  * layouts must produce identical values.
  */
class DeterminismAuditSpec extends SparkSpec {

  test("unpack output values are invariant to input partition layout (site 3)") {
    val s = spark
    import s.implicits._
    val base = (0L until 60L).map { i =>
      val names = (0 to (i % 3).toInt).map(j => s"""{"name":"n$i-$j"}""").mkString(",")
      (i, s"""{"name_repeat":[$names],"note_repeat":[{"lang":"de","source":"s$i"}]}""")
    }.toDF("doc_id", "payload")

    def run(parts: Int): Seq[String] =
      graft.unpack.Unpack.unpack(base.repartition(parts), "payload")
        .collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("|"))
        .toSeq.sorted

    val a = run(1)
    val b = run(7)
    assert(a === b, "unpack values diverged across partition layouts")
    // the synthesized row_id must not leak into the output
    assert(!graft.unpack.Unpack.unpack(base, "payload").columns.contains("row_id"))
  }

  test("EncDeduplicater run + matchStats are invariant to input partition layout (site 2, the q63 shape)") {
    val s = spark
    import s.implicits._
    // miniature q63 construction: explicit row_id (the key itself), all
    // four document classes, including a short tail document
    val rows = (0L until 100L).map { k =>
      val doc = k / 3
      def v(cls: Long, tag: String): String = cls match {
        case 0 => s"$tag$doc"
        case 1 => Seq("aa", "bb", "cc")((k % 3).toInt)
        case 2 => if (k % 3 == 0) s"x$doc" else "-"
        case _ => "-"
      }
      (doc.toString, k, v(doc % 4, "v"), v((doc + 1) % 4, "w"), "false", "false")
    }.toDF("doc_id", "row_id", "field_a", "field_b", "field_a_qa", "field_b_qa")

    val spec = graft.consensus.DedupSpec(idCol = "doc_id",
      otherStrictCols = Seq("field_a", "field_b"))

    def stats(parts: Int): Seq[String] = {
      val input = rows.repartition(parts)
      val result = graft.consensus.EncDeduplicater.run(input, spec)
      graft.consensus.EncDeduplicater.matchStats(input, spec, result)
        .orderBy(col("column"))
        .collect().map(_.toSeq.mkString("|")).toSeq
    }

    val a = stats(1)
    val b = stats(7)
    assert(a === b, s"matchStats diverged across partition layouts:\n$a\nvs\n$b")
    // spot-check the class math on this 34-document corpus (docs 0..33;
    // doc 33 is a one-row tail): field_a classes doc%4
    assert(a.exists(_.startsWith("field_a|")), a.mkString("\n"))
  }
}
