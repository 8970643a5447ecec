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
