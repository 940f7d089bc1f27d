package graft

/** Dev-time differential sweep: PyCase.lower / PyCase.upper vs CPython
  * str.lower()/str.upper() over every codepoint in context (lower gets
  * the same four sigma-context shapes as TitleSweep; upper is
  * context-free, two shapes). Probe TSV format and generation recipe as
  * in TitleSweep / gen_ground_truth.py:
  *
  *   sbt 'Test/runMain graft.CaseSweep lower /tmp/lower_probes.tsv'
  *   sbt 'Test/runMain graft.CaseSweep upper /tmp/upper_probes.tsv'
  *
  * Exit 0 iff zero mismatches. With a third arg `dump`, prints each
  * distinct first-codepoint whose mapping mismatches as a Scala map
  * entry (used once to generate PyCase.upperExc).
  */
object CaseSweep {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val path = args(1)
    val dump = args.length > 2 && args(2) == "dump"
    val fn: String => String =
      if (which == "lower") graft.normalize.PyCase.lower else graft.normalize.PyCase.upper
    def decode(s: String): String = {
      val sb = new java.lang.StringBuilder
      if (s.nonEmpty) s.split(' ').foreach(t => sb.appendCodePoint(t.toInt))
      sb.toString
    }
    var n = 0L
    var bad = 0L
    val seen = scala.collection.mutable.LinkedHashSet.empty[Int]
    val src = scala.io.Source.fromFile(path)
    try {
      for (line <- src.getLines()) {
        val parts = line.split('\t')
        val input = decode(parts(0))
        val expected = if (parts.length > 1) decode(parts(1)) else ""
        val got = fn(input)
        n += 1
        if (got != expected) {
          bad += 1
          val cp = input.codePointAt(if (input.startsWith("A") || input.startsWith("a")) 1 else 0)
          if (dump) {
            if (!seen(cp)) {
              seen += cp
              // python mapping of the probe codepoint alone, as escapes
              val single = new java.lang.StringBuilder().appendCodePoint(cp).toString
              val exp1 = expected // context shapes: derive from full-string diff is messy; print raw
              println(f"0x$cp%X -> in=${parts(0)} exp=${parts(1)} got=${got.map(_.toInt.toString).mkString(" ")} [$single]$exp1")
            }
          } else if (bad <= 40)
            println(s"MISMATCH in=${parts(0)} exp=${parts(1)} " +
              s"got=${got.map(c => c.toInt.toString).mkString(" ")}")
        }
      }
    } finally src.close()
    println(s"$n probes, $bad mismatches, ${seen.size} distinct cps")
    if (bad > 0 && !dump) sys.exit(1)
  }
}
