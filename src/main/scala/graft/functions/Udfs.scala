package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import graft.similarity.Similarity

/** UDF registry for the pure-Scala kernels (fuzzy ratios, name
  * preprocessing, similarity measures). Registering once per session makes
  * them usable from both the Column API and `spark.sql`.
  *
  * These stay UDFs (not Catalyst expressions) deliberately: each is an
  * allocation-light scalar function whose cost is dominated by the string
  * algorithm itself, not the call boundary; none sits on a scan-heavy
  * filter path where codegen fusion would matter.
  */
object Udfs {
  val fuzzRatio: UserDefinedFunction = udf((a: String, b: String) => Fuzz.ratio(a, b))
  val tokenSetRatio: UserDefinedFunction = udf((a: String, b: String) => Fuzz.tokenSetRatio(a, b))
  // null-safe like every sibling: Fuzz.jaro dereferences its args (the
  // Catalyst twin uses nullSafeEval; ratio/tokenSetRatio null-guard in
  // defaultProcess) — a null column value must yield null, not an NPE
  // that fails the job from inside a per-row UDF
  val jaro: UserDefinedFunction =
    udf((a: String, b: String) => if (a == null || b == null) null else Fuzz.jaro(a, b): java.lang.Double)
  val preprocessName: UserDefinedFunction =
    udf((s: String) => if (s == null) null else NamePreprocess.preprocessName(s))
  val preprocessLastName: UserDefinedFunction =
    udf((s: String) => if (s == null) null else NamePreprocess.preprocessLastName(s))
  val fixVisualDecoding: UserDefinedFunction =
    udf((s: String) => NamePreprocess.fixVisualCharacterDecoding(s))
  val fixNameUppercasing: UserDefinedFunction =
    udf((s: String) => if (s == null) null else NamePreprocess.fixNameUppercasing(s))
  val dateSimilarity: UserDefinedFunction =
    udf((a: String, b: String) => Similarity.dateSimilarity(a, b))
  val simpleDateMatcher: UserDefinedFunction =
    udf((a: String, b: String) => Similarity.simpleDateMatcher(a, b))
  // the q29 language-ID heuristic, SQL-callable: the kernel itself is
  // null-safe (null -> "unknown"), and registering it routes the
  // char-range branch table through UDF serialization — the same
  // executor path q29 exercises via TextStats.detectLanguageUdf
  val detectLanguage: UserDefinedFunction =
    udf((s: String) => graft.text.TextStats.detectLanguage(s))

  /** Register everything under SQL-callable names. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("fuzz_ratio", fuzzRatio)
    spark.udf.register("token_set_ratio", tokenSetRatio)
    spark.udf.register("jaro", jaro)
    spark.udf.register("preprocess_name", preprocessName)
    spark.udf.register("preprocess_last_name", preprocessLastName)
    spark.udf.register("fix_visual_decoding", fixVisualDecoding)
    spark.udf.register("fix_name_uppercasing", fixNameUppercasing)
    spark.udf.register("date_similarity", dateSimilarity)
    spark.udf.register("simple_date_matcher", simpleDateMatcher)
    spark.udf.register("detect_language", detectLanguage)
  }
}
