package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.linkage.PersonMatching
import graft.linkage.PersonMatching.MatchConfig

/** TEMPORARY measurement harness for the memoizeNameKernels A/B on a
  * Zipf corpus whose co-bucketed names DIFFER but REPEAT (the regime the
  * flag was designed for; q22's equal-heavy corpus measured the memo
  * SLOWER). Deleted after the numbers land in PersonMatching's comment.
  */
object MemoBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // vocab: 100 gname groups x 4 variants sharing (2-char prefix, length)
    // => same bucket, different strings; 4 lname groups x 4 variants
    val gSuf = Seq("onardowitsch", "enrikssonder", "ulrichsenberg", "arlosvonberg")
    val lSuf = Seq("ermannsdorfer", "artmutkessler", "olgersonmeyer", "urtzelbrandt")
    val gVocab = for (g <- 0 until 100; v <- 0 until 4)
      yield s"${('a' + g / 10).toChar}${('a' + g % 10).toChar}${gSuf(v)}"
    val lVocab = for (g <- 0 until 4; v <- 0 until 4)
      yield s"${('a' + g).toChar}x${lSuf(v)}"
    val gArr = array(gVocab.map(lit): _*)
    val lArr = array(lVocab.map(lit): _*)

    val n = 60000
    // quadratic-skew group pick (Zipf-ish hot buckets), variant by id
    val u1 = (pmod(hash(col("id"), lit(1)), lit(1000)).cast("double") / 1000.0)
    val u2 = (pmod(hash(col("id"), lit(2)), lit(1000)).cast("double") / 1000.0)
    val gIdx = (floor(pow(u1, 2.0) * 100).cast("int") * 4 + pmod(col("id"), lit(4)).cast("int"))
    val lIdx = (floor(pow(u2, 2.0) * 4).cast("int") * 4 + pmod(col("id") / 4, lit(4)).cast("int"))
    val persons = spark.range(n).select(
      col("id").as("pid"),
      element_at(gArr, gIdx + 1).as("strGName_processed"),
      element_at(lArr, lIdx + 1).as("strLName_processed"),
      lit("19500101").as("strDoB_processed"),
      col("id").cast("string").as("prisoner_number"))
      .localCheckpoint()

    def run(memo: Boolean): Double = {
      val m = PersonMatching.personMatching(
        persons.withColumnRenamed("pid", "srcID"),
        persons.withColumnRenamed("pid", "trgID"),
        MatchConfig(topN = 1, minScore = 0.0, selfJoinMirror = true,
          memoizeNameKernels = memo))
      val t0 = System.nanoTime()
      m.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(memo = false) // warmup: JIT + codegen
    val results = Seq(true, false, true, false).map(m => m -> run(m))
    results.foreach { case (m, t) => println(f"memo=$m%-5s ${t}%.2f s") }
    spark.stop()
  }
}
