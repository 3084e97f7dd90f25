package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (`Aggregator`): single-pass column stats
  * (count, min, max, sum) — the one-pass generalization of the
  * P1/P3 profile ops (SURVEY §7.3 "optionally one Aggregator for
  * single-pass elegance").
  *
  * Merge-associative buffer → partial aggregation map-side, exactly
  * like a built-in agg; usable as a `TypedColumn` on `Dataset[Double]`
  * groups or registered via `functions.udaf`.
  */
final case class ColStats(
    count: Long, min: Double, max: Double, sum: Double) {
  def mean: Double = if (count == 0) Double.NaN else sum / count
}

class StatsAggregator extends Aggregator[java.lang.Double, ColStats, ColStats] {

  override def zero: ColStats =
    ColStats(0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0)

  // null inputs never reach reduce: the typed-aggregation input
  // projection filters them (null counting is the P3 profile op's job)
  override def reduce(b: ColStats, a: java.lang.Double): ColStats =
    ColStats(b.count + 1, math.min(b.min, a), math.max(b.max, a), b.sum + a)

  override def merge(x: ColStats, y: ColStats): ColStats =
    ColStats(
      x.count + y.count,
      math.min(x.min, y.min), math.max(x.max, y.max), x.sum + y.sum)

  override def finish(r: ColStats): ColStats = r

  override def bufferEncoder: Encoder[ColStats] = Encoders.product[ColStats]
  override def outputEncoder: Encoder[ColStats] = Encoders.product[ColStats]
}
