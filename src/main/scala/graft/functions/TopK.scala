package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator — the scale-correct alternative
  * to `row_number().over(partitionBy(g).orderBy(v)) <= k`: the window
  * form shuffles EVERY row of the group and sorts it; this buffer
  * holds at most k (value, id) pairs and merges associatively, so the
  * map side combines and the shuffle carries <= k rows per upstream
  * partition per group, never the raw group. Deterministic total
  * order: value DESC, id ASC on exact ties — the same order the
  * window/oracle form uses, so results are hash-comparable.
  *
  * The buffer is a sorted Seq capped at k; insert is O(k) which is the
  * right trade for the small k (top-3, top-10) this exists for.
  */
case class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val (front, back) = buf.span(better(_, x))
    val merged = front ++ (x +: back)
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(b, in)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
