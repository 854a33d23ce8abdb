package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator` — the
  * heavy-hitter-shaped alternative to `row_number() OVER (...) ≤ k`.
  *
  * The window form shuffles and SORTS every row of every group; this
  * aggregator keeps a k-element buffer per group, so map-side partial
  * aggregation bounds the shuffle to k rows per (partition × group)
  * and nothing is ever globally sorted — at 100 TB with k ≪ rows per
  * group that is the difference between shuffling the fact table and
  * shuffling a few KB per group. Results are EXACT (top-k is an
  * associative, bounded-buffer aggregate, unlike quantiles), and ties
  * break on the id for engine-independent determinism.
  *
  * The buffer insert is `(buf :+ row).sorted.take(k)` — O(k log k)
  * per row, fine for the small k this surface targets (a production
  * variant for large k would keep a binary heap; the dataflow shape,
  * which is what matters at scale, is identical).
  */
object TopKRowsAggregator {

  final case class ScoredRow(score: Double, id: Long)

  /** Descending by score, ascending id as the deterministic tiebreak. */
  private val ord: Ordering[ScoredRow] =
    Ordering.by((r: ScoredRow) => (-r.score, r.id))

  final class TopK(k: Int)
      extends Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {
    require(k > 0, "top-k needs k > 0")

    override def zero: Seq[ScoredRow] = Vector.empty

    override def reduce(buf: Seq[ScoredRow], in: ScoredRow): Seq[ScoredRow] =
      if (buf.size == k && ord.lteq(buf.last, in)) buf // below the bar
      else (buf :+ in).sorted(ord).take(k)

    override def merge(a: Seq[ScoredRow], b: Seq[ScoredRow]): Seq[ScoredRow] =
      (a ++ b).sorted(ord).take(k)

    override def finish(buf: Seq[ScoredRow]): Seq[ScoredRow] = buf

    override def bufferEncoder: Encoder[Seq[ScoredRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
    override def outputEncoder: Encoder[Seq[ScoredRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
  }
}
