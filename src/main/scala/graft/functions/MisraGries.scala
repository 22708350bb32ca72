package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed Aggregator — the
  * deterministic frequent-items sketch next to the count-min tier
  * (q52/q108): at most `k` counters, and every item with true
  * frequency > n/k is GUARANTEED present in the final candidate set
  * (count-min gives frequency estimates; MG gives a bounded candidate
  * list with a one-sided guarantee and zero randomness).
  *
  * Distribution: the summary is mergeable with additive error (Agarwal
  * et al., "Mergeable Summaries", PODS'12): merge sums counts by key,
  * then subtracts the (k+1)-th largest count from everything and drops
  * non-positives — each partial's error is <= n_partial/k, and errors
  * add to <= n/k, so the map-side combine is lossless w.r.t. the
  * guarantee. Buffer is O(k) regardless of input size; reduce's
  * miss-path decrement is O(k) — the right trade for the small k
  * (tens) a heavy-hitter query uses.
  *
  * Determinism note: the candidate SET (beyond the guaranteed items)
  * depends on merge order, so gates must never emit raw candidates —
  * emit the exact-count witness join (q39/q95 discipline): exact
  * frequent items + boolean "present in sketch".
  */
case class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)            => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None => // classic MG: decrement every counter, drop zeros
        b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      summed.flatMap { case (key, c) => if (c - cut > 0) Some(key -> (c - cut)) else None }
    }
  }

  /** Sorted for a deterministic array layout; the semantic content is
    * the SET (see determinism note above). */
  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
