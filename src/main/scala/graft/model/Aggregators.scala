package graft.model

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The measure escape hatch (SURVEY §2.9 / §7.3): the reference accepts any
  * R closure as `fun.aggregate`; the Spark engine's open-world equivalent
  * is a typed `Aggregator[IN, BUF, OUT]` wrapped into a `Column` function
  * so it plugs into [[Measure]] like any built-in. Partial aggregation
  * (map-side combine) comes from `merge` — unlike an R closure, a Spark
  * Aggregator scales because the planner can split it. */
object Aggregators {

  /** Wrap a double Aggregator as a Measure-compatible Column function. */
  def asMeasureFn(agg: Aggregator[Double, _, Double]): Column => Column = {
    val fn = udaf(agg, Encoders.scalaDouble)
    c => fn(c)
  }

  def measure(vr: String, name: String,
              agg: Aggregator[Double, _, Double]): Measure =
    Measure(vr, name, asMeasureFn(agg))

  /** Product of values — an aggregate Spark has no builtin for (the
    * canonical "user closure" example). */
  object Product extends Aggregator[Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: Double): Double = b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** One (score, id) candidate flowing into [[TopKByScore]]. */
  final case class ScoredId(score: Double, id: Long)

  /** Bounded-buffer contents of [[TopKByScore]] (a case-class wrapper so
    * `Encoders.product` handles the nested Seq). */
  final case class TopKBuf(items: Seq[ScoredId])

  /** Bounded per-group top-k by (score desc, id asc) — the aggregation
    * form of TakeOrdered for grouped data. As a `udaf` the planner gives
    * it map-side partial aggregation (ObjectHashAggregate), so a shuffle
    * carries at most k elements per (partition, group) instead of every
    * scored row: ranking |Q|·|C| brute-force kNN candidates shuffles
    * |Q|·k·partitions rows, not |Q|·|C| (the row_number-window form
    * shuffles everything). The buffer is compacted to k whenever it
    * reaches 2k, so per-row cost is amortized O(log k). */
  final class TopKByScore(k: Int)
      extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
    require(k > 0, s"k must be positive, got $k")
    private def ord: Ordering[ScoredId] =
      Ordering.by((s: ScoredId) => (-s.score, s.id))
    def zero: TopKBuf = TopKBuf(Vector.empty)
    def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
      val v = b.items :+ a
      TopKBuf(if (v.size >= 2 * k) v.sorted(ord).take(k) else v)
    }
    def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
      TopKBuf((x.items ++ y.items).sorted(ord).take(k))
    def finish(b: TopKBuf): TopKBuf = TopKBuf(b.items.sorted(ord).take(k))
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Geometric mean via log-space sums (stable + mergeable). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
