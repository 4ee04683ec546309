package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a bounded typed aggregator —
  * the heavy-hitter sketch completing the engine's mergeable-sketch
  * family (KMV cardinality, HyperLogLog registers, count-min cells):
  * O(k) state per partition partial, one merge, and the classic
  * deterministic guarantee with NO exact per-key aggregation anywhere:
  *
  *   - every key with true count > n/(k+1) is present in the summary
  *     (the candidate set is a certified SUPERSET of the heavy hitters);
  *   - a summary estimate only undercounts, by at most n/(k+1).
  *
  * The buffer maps key → decremented count. reduce lets the buffer grow
  * to 2k before compressing (amortized O(1) per row); merge sums two
  * summaries and compresses — the Agarwal et al. mergeable-summaries
  * COMPRESS (subtract the (k+1)-th largest count from every entry, drop
  * non-positives), whose error bound survives ARBITRARY merge trees:
  * each compress discards at least (k+1)·cut of inserted mass, so the
  * cuts any key absorbed total at most n/(k+1). That mergeability is
  * the 100 TB posture — partition partials, executor merges, and
  * micro-batch state merges all reuse the same operation with the same
  * bound.
  *
  * At this tier the sketch finds CANDIDATES; an exact verify pass
  * (count only the ≤k candidate keys) turns them into a deterministic
  * heavy-hitter result — see CurationOps.heavyHitters and the adaptive
  * skew salting in RelationalOps.
  */
case class MisraGries(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"MisraGries requires k > 0, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: String): Map[String, Long] = {
    val up = buf.updated(in, buf.getOrElse(in, 0L) + 1L)
    if (up.size > 2 * k) MisraGries.compress(up, k) else up
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    val sum = small.foldLeft(big) { case (m, (s, c)) =>
      m.updated(s, m.getOrElse(s, 0L) + c)
    }
    MisraGries.compress(sum, k)
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] =
    MisraGries.compress(buf, k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object MisraGries {
  /** The mergeable-summaries COMPRESS: keep at most k entries by
    * subtracting the (k+1)-th largest count from every entry and
    * dropping the non-positive remainder. Deterministic — survival
    * depends only on each entry's count vs the cut, never on map order.
    */
  def compress(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (s, c) if c > cut => s -> (c - cut) }
    }

  /** The summary as an untyped aggregate column (usable alongside plain
    * aggregates like count in one pass).
    */
  def udafCol(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(MisraGries(k), Encoders.STRING)
}
