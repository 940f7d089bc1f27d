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
