package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.3 E34): weighted average as an
  * `Aggregator[IN, BUF, OUT]`, registered with `functions.udaf`.
  *
  * The buffer is a (Σ w·x, Σ w) pair — associative and commutative, so
  * Spark computes partial aggregates map-side and merges across the
  * shuffle, exactly like a built-in `sum`.
  */
final case class WeightedAvgBuf(var wsum: Double, var weight: Double)

object WeightedAvg extends Aggregator[(Double, Double), WeightedAvgBuf, Double] {
  override def zero: WeightedAvgBuf = WeightedAvgBuf(0.0, 0.0)

  override def reduce(b: WeightedAvgBuf, in: (Double, Double)): WeightedAvgBuf = {
    b.wsum += in._1 * in._2
    b.weight += in._2
    b
  }

  override def merge(a: WeightedAvgBuf, b: WeightedAvgBuf): WeightedAvgBuf = {
    a.wsum += b.wsum
    a.weight += b.weight
    a
  }

  override def finish(b: WeightedAvgBuf): Double =
    if (b.weight == 0.0) 0.0 else b.wsum / b.weight

  override def bufferEncoder: Encoder[WeightedAvgBuf] = Encoders.product[WeightedAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
