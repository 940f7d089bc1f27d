package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bench-only corpus scaling for growth measurements.
  *
  * `frac` is read from the JVM property `graft.bench.scale.frac`
  * (default 1.0). At 1.0 — every driver, Verify, and test run — the
  * sampling helpers return their input untouched, so plans and oracle
  * results are bit-identical to a build without this knob. The Bench
  * scaling pass sets 0.5 to time the similarity family on half the
  * corpus and report cost growth per data-doubling.
  */
object ScaleKnob {
  val Prop = "graft.bench.scale.frac"

  def frac: Double = sys.props.get(Prop).map(_.toDouble).getOrElse(1.0)

  /** Deterministic uniform sample: keeps rows with `id % 1000` below
    * `frac * 1000`. Identity when frac ≥ 1.
    */
  def sample(df: DataFrame, idCol: String): DataFrame =
    if (frac >= 1.0) df
    else df.filter(pmod(col(idCol), lit(1000)) < math.round(frac * 1000).toInt)
}
