package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (the Aggregator tier of SURVEY.md §2.10's
  * UDF ladder): duration-weighted mean of watched_ratio — "average
  * watch completion weighted by video length", which the plain
  * avg(watched_ratio) analytics (A2) mis-states for mixed-length
  * catalogs.
  *
  * Scale shape: the buffer is two doubles, merged associatively —
  * Spark runs it as a partial aggregate (map-side combine), so the
  * shuffle carries one (sum, weight) pair per upstream partition key,
  * never raw rows. Registered via `udaf()` it is also callable from
  * SQL text.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  // IN = (value, weight); BUF = (weighted sum, weight sum)
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
