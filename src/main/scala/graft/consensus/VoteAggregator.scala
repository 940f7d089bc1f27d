package graft.consensus

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** The consensus vote as a typed `Aggregator[IN, BUF, OUT]` (the SURVEY
  * §2.10 shape): usable directly in `groupByKey(...).agg(...)` or as a
  * registered UDAF over any single column.
  *
  * Input is `(orderKey, value)` — the vote is order-sensitive
  * (tie-to-last, metadata-first), so the buffer carries the explicit row
  * order and `finish` sorts before running the matcher pipeline. `merge`
  * concatenates buffers, which keeps the aggregation correct under
  * partial aggregation: the sort in `finish` restores global order no
  * matter how partitions interleaved.
  *
  * `EncDeduplicater` computes many columns per group in one `mapGroups`
  * pass instead (cheaper than one aggregator per column); this type is
  * the single-column surface.
  */
class VoteAggregator(makeMatcher: () => ColMatcher)
    extends Aggregator[(Long, String), ArrayBuffer[(Long, String)], String] {

  @transient private lazy val matcher: ColMatcher = makeMatcher()

  override def zero: ArrayBuffer[(Long, String)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, String)], in: (Long, String)): ArrayBuffer[(Long, String)] = {
    b += in; b
  }

  override def merge(a: ArrayBuffer[(Long, String)], b: ArrayBuffer[(Long, String)]): ArrayBuffer[(Long, String)] = {
    a ++= b; a
  }

  override def finish(buf: ArrayBuffer[(Long, String)]): String = {
    val values = buf.sortBy(_._1).map(v => Option(v._2).getOrElse("-")).toVector
    matcher(values).orNull
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, String)]] =
    Encoders.kryo[ArrayBuffer[(Long, String)]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object VoteAggregator {
  def default(): VoteAggregator = new VoteAggregator(() => Matchers.default())
  def strict(): VoteAggregator = new VoteAggregator(() => Matchers.strict())
  def date(): VoteAggregator = new VoteAggregator(() => Matchers.date())
  def fuzzy(): VoteAggregator = new VoteAggregator(() => Matchers.fuzzy())
}
