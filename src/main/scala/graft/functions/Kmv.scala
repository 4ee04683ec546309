package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values sketch as a bounded typed aggregator (the same
  * custom-aggregate tier as [[TopKByScore]]): the buffer is the k smallest
  * DISTINCT hash values seen so far, kept sorted ascending. This is the
  * one-pass shape of KMV cardinality estimation — per-partition partial
  * sketches of O(k) state, merged once — replacing the two-shuffle
  * distinct + global top-k formulation while producing the IDENTICAL
  * k-th minimum (dedup happens inside the buffer: equal values are
  * rejected on insert and collapsed on merge). At 100 TB this is the
  * difference between shuffling every distinct n-gram hash once and
  * shuffling 32 sketch rows.
  *
  * reduce is an O(1) reject once the buffer is full and the value is no
  * smaller than the current k-th (the overwhelmingly common case), else a
  * bounded O(k) insert; merge is a deduplicating linear merge of two
  * sorted runs truncated at k.
  */
case class KMinValues(k: Int)
  extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"KMinValues requires k > 0, got $k")

  // Vector, not List: the O(1)-reject fast path reads buf.last on EVERY
  // input row, which is O(k) on a List — at k=256 that tail-walk was the
  // dominant cost of the whole sketch (measured ~2 s of 2.9 s at sf0.1)
  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] = {
    // full buffer and in >= current kth: either a duplicate of a kept
    // value or too large to enter — both reject without scanning
    if (buf.size >= k && in >= buf.last) buf
    else {
      val (before, after) = buf.span(_ < in)
      if (after.nonEmpty && after.head == in) buf // already present
      else (before ++ (in +: after)).take(k)
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty) { out += x.head; x = x.tail }
      else if (x.isEmpty) { out += y.head; y = y.tail }
      else if (x.head == y.head) { out += x.head; x = x.tail; y = y.tail }
      else if (x.head < y.head) { out += x.head; x = x.tail }
      else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
