package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per
  * group in a bounded buffer, so a global or per-group top-k needs NO
  * full sort and NO single-partition window — the 100 TB-safe rewrite
  * SURVEY.md §2.6 flags for W1 when customer cardinality explodes.
  * Merge is associative: partial top-k buffers combine map-side like any
  * other aggregate.
  */
class TopK(k: Int) extends Aggregator[(Long, Double), List[(Double, Long)], Seq[Long]] {
  require(k > 0)

  override def zero: List[(Double, Long)] = Nil

  private def trim(l: List[(Double, Long)]): List[(Double, Long)] =
    // descending by score, id tiebreak for determinism
    l.sortBy { case (s, id) => (-s, id) }.take(k)

  override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] =
    trim((in._2, in._1) :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
