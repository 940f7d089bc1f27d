package graft

import org.apache.spark.sql.functions._
import graft.expressions.FuzzColumns
import graft.functions.Fuzz

/** Native Catalyst fuzzy expressions: value parity with the kernels,
  * null semantics, and codegen participation.
  */
class FuzzExpressionSpec extends SparkSpec {
  private val session = SparkSpec.spark
  import session.implicits._

  private def pairs = Seq(
    ("kitten", "sitting"), ("Müller", "Mueller"), ("", ""), ("abc", ""),
    ("fuzzy was a bear", "fuzzy fuzzy was a bear"), ("MARTHA", "MARHTA"))
    .toDF("a", "b")

  test("native expressions match the scala kernels exactly") {
    val rows = pairs.select(col("a"), col("b"),
      FuzzColumns.indelRatio(col("a"), col("b")).as("r"),
      FuzzColumns.tokenSetRatio(col("a"), col("b")).as("t"),
      FuzzColumns.jaro(col("a"), col("b")).as("j")).collect()
    for (r <- rows) {
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getDouble(2) === Fuzz.ratio(a, b))
      assert(r.getDouble(3) === Fuzz.tokenSetRatio(a, b))
      assert(r.getDouble(4) === Fuzz.jaro(a, b))
    }
  }

  test("null inputs yield null (expression null semantics)") {
    val row = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(FuzzColumns.indelRatio(col("a"), col("b"))).head()
    assert(row.isNullAt(0))
  }

  test("the expression runs inside a codegen'd scan stage") {
    // parquet-backed (a local relation would be optimizer-folded away)
    val df = graft.core.Tables.part(spark, sf)
      .filter(FuzzColumns.indelRatio(col("p_name"), col("p_type")) > 10.0)
      .select(col("p_partkey"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), "filter stage should be whole-stage codegen'd")
    assert(plan.toLowerCase.contains("indelratio"), "native expression missing from plan")
  }

  test("Udfs.register exposes every kernel to spark.sql") {
    graft.functions.Udfs.register(spark)
    val r = spark.sql(
      """SELECT fuzz_ratio('kitten','sitting') AS a,
        |  token_set_ratio('one two','two one') AS b,
        |  jaro('MARTHA','MARHTA') AS c,
        |  preprocess_name('Schwartz') AS d,
        |  preprocess_last_name('Nowakowa') AS e,
        |  fix_visual_decoding('Мüller') AS f,
        |  fix_name_uppercasing('hans müller') AS g,
        |  date_similarity('19430312','12.03.1943') AS h,
        |  simple_date_matcher('12.03.1943','12.03.1943') AS i""".stripMargin).head()
    assert(r.getDouble(0) === Fuzz.ratio("kitten", "sitting"))
    assert(r.getDouble(1) === 100.0)
    assert(math.abs(r.getDouble(2) - Fuzz.jaro("MARTHA", "MARHTA")) < 1e-9)
    assert(r.getString(3) === "schvarz")
    assert(r.getString(4) === "novak")
    assert(r.getString(5) === "Müller")
    assert(r.getString(6) === "Hans Müller")
    assert(r.getDouble(7) === 100.0)
    assert(r.getDouble(8) === 100.0)
  }

  test("extension-injected SQL functions resolve in a fresh session") {
    // register via the same builders the SparkSessionExtensions injector
    // uses (a second session with different extensions cannot be created
    // in this JVM; the registry path is identical)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("native_fuzz_ratio"),
      new ExpressionInfo(classOf[graft.expressions.IndelRatio].getName, "native_fuzz_ratio"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.IndelRatio(children(0), children(1)))
    val v = spark.sql("SELECT native_fuzz_ratio('kitten', 'sitting') AS r").head().getDouble(0)
    assert(v === Fuzz.ratio("kitten", "sitting"))
  }
}
