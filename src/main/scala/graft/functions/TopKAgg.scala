package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) observation feeding a top-k aggregation. */
final case class ScoredId(id: Long, score: Double)

/** Bounded top-k typed aggregator: keeps the k highest-scoring ids,
  * ordered by (score desc, id asc) for deterministic ties.
  *
  * This is the scale-correct per-group top-k: the buffer never exceeds k
  * elements, and because `Aggregator`s participate in partial aggregation,
  * each map task pre-reduces its partition to ≤ k rows per group before
  * the shuffle — per-query state is O(k), not O(corpus). A window-function
  * `row_number() <= k` formulation would instead shuffle and sort every
  * candidate row per group.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def ord(s: ScoredId): (Double, Long) = (-s.score, s.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ a).sortBy(ord)
    else if (Ordering[(Double, Long)].lt(ord(a), ord(buf.last)))
      (buf.init :+ a).sortBy(ord)
    else buf

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    (b1 ++ b2).sortBy(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
}
