package graft.relational

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF face of the A10 trip-weighted mean (SURVEY §2.9: the
  * reference's client-side Σ(avg×n)/Σ(n) — `SQL/sql_utils.py:246-254`).
  * The expression form (`RelationalQueries.weightedMean`) is the
  * production path — it stays inside codegen; this Aggregator is the
  * typed-API equivalent for Dataset pipelines, with the same mergeable
  * (sum, count) state that makes it a one-pass distributed aggregate:
  * `reduce` runs map-side per partition, `merge` combines partial states
  * at the exchange, exactly like a Catalyst partial/final HashAggregate.
  * The spec asserts it matches the expression form bit-for-bit. */
object WeightedMeanAgg extends Aggregator[(Double, Long), (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  def finish(r: (Double, Long)): Double = r._1 / r._2
  def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
