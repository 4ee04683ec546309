package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator (SURVEY §4.3 custom-aggregate tier):
  * keeps the k best (score, id) pairs per group in the aggregation buffer
  * itself, so a grouped top-k needs only a partial+final HashAggregate —
  * no window, no per-group full sort, no shuffle of below-threshold rows.
  * This is the shape that matters for ANN at corpus scale: the per-group
  * state is O(k) regardless of group size.
  *
  * Ordering is (score DESC, id ASC) — ties break deterministically, which
  * keeps the result oracle-comparable.
  */
case class TopKByScore(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def best(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    best(buf :+ in)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(a ++ b)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
