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
  *
  * `docsCap` (property `graft.bench.docs.cap`, default 2500) bounds the
  * synthetic dedup demo corpus; the Bench scaling pass lifts it to 5000
  * so the capped dedup family sees real corpus growth. Default keeps
  * every oracle bit-identical to the hardcoded literal it replaced.
  *
  * Both properties are validated once at first read and fail with a
  * message naming the property, instead of surfacing a
  * NumberFormatException (or a silently empty sample) deep inside plan
  * construction.
  */
object ScaleKnob {
  val Prop = "graft.bench.scale.frac"
  val DocsCapProp = "graft.bench.docs.cap"

  def frac: Double = sys.props.get(Prop) match {
    case None => 1.0
    case Some(raw) =>
      val v =
        try raw.toDouble
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$Prop must be a number in (0, 1], got '$raw'")
        }
      require(v > 0.0 && v <= 1.0, s"$Prop must be in (0, 1], got $raw")
      v
  }

  def docsCap: Int = sys.props.get(DocsCapProp) match {
    case None => 2500
    case Some(raw) =>
      val v =
        try raw.toInt
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$DocsCapProp must be a positive integer, got '$raw'")
        }
      require(v > 0, s"$DocsCapProp must be a positive integer, got $raw")
      v
  }

  /** Deterministic uniform sample: keeps rows with `id % 1000` below
    * `frac * 1000`. Identity when frac ≥ 1.
    */
  def sample(df: DataFrame, idCol: String): DataFrame =
    if (frac >= 1.0) df
    else df.filter(pmod(col(idCol), lit(1000)) < math.round(frac * 1000).toInt)
}
