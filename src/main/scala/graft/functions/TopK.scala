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
  * The buffer is kept SORTED by (score DESC, id ASC) as an invariant, so
  * `reduce` is an O(1) reject for any row that can't enter a full buffer
  * (the overwhelmingly common case once the buffer fills) and an O(k)
  * bounded insertion otherwise — vs the previous full re-sort, which paid
  * O(k log k) on EVERY input row. `merge` is a linear merge of two sorted
  * runs. Ties break deterministically on id, which keeps the result
  * oracle-comparable.
  */
case class TopKByScore(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  // k <= 0 would make the fast-path `buf.size >= k` trivially true on an
  // empty buffer and `buf.last` throw; fail construction instead.
  require(k > 0, s"TopKByScore requires k > 0, got $k")

  // ascending sort key: better elements first
  @inline private def key(e: (Double, Long)): (Double, Long) = (-e._1, e._2)
  private val ord = Ordering[(Double, Long)]

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && ord.lteq(key(buf.last), key(in))) buf // O(1) fast path
    else {
      val (before, after) = buf.span(e => ord.lt(key(e), key(in)))
      (before ++ (in +: after)).take(k)
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // linear merge of two sorted runs, truncated at k
    val out = Seq.newBuilder[(Double, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.lteq(key(x.head), key(y.head)))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Payload-carrying variant of [[TopKByScore]]: each element is
  * (score, id, payload) where ordering is still (score DESC, id ASC) and
  * the payload rides along untouched — the shape needed when the ranked
  * row carries columns beyond its sort key (e.g. the IVF cell a neighbor
  * was found in). Kept as a separate arity-3 aggregator rather than a
  * generic one because Catalyst tuple encoders resolve concretely here,
  * and the two stay small enough to audit side by side. Same invariants:
  * buffer sorted, O(1) reject fast path, linear bounded merge.
  */
case class TopKByScoreTagged(k: Int)
  extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]] {
  require(k > 0, s"TopKByScoreTagged requires k > 0, got $k")

  @inline private def key(e: (Double, Long, Long)): (Double, Long) = (-e._1, e._2)
  private val ord = Ordering[(Double, Long)]

  override def zero: Seq[(Double, Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long, Long)], in: (Double, Long, Long)): Seq[(Double, Long, Long)] = {
    if (buf.size >= k && ord.lteq(key(buf.last), key(in))) buf // O(1) fast path
    else {
      val (before, after) = buf.span(e => ord.lt(key(e), key(in)))
      (before ++ (in +: after)).take(k)
    }
  }

  override def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = {
    val out = Seq.newBuilder[(Double, Long, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.lteq(key(x.head), key(y.head)))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
