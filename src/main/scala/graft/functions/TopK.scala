package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Single source of truth for the (score desc, id asc) TOTAL order both
  * aggregators rank by. `java.lang.Double.compare`, never IEEE `<`: under
  * IEEE compare a NaN in the kth slot would permanently reject every
  * better row (NaN compares false against everything), silently freezing
  * the buffer. Keeping the comparator in one place makes the
  * sort-key/short-circuit agreement structural — an `Ordering.Double
  * .IeeeOrdering` import near a sortBy can no longer diverge them.
  */
object TopKOrder {
  /** < 0 iff (xs, xi) ranks strictly before (ys, yi). The NEGATED-score
    * compare, not compare(ys, xs): negation keeps NaN as NaN, so NaN
    * ranks LAST (a NaN score is a worst candidate, never a best one),
    * where compare(ys, xs) would rank it first and let a NaN hijack the
    * top slot.
    */
  def cmp(xs: Double, xi: Long, ys: Double, yi: Long): Int = {
    val c = java.lang.Double.compare(-xs, -ys) // score desc, NaN last
    if (c != 0) c else java.lang.Long.compare(xi, yi) // id asc
  }

  // Orderings live on this (static) object: a captured Ordering field
  // would not survive the aggregator's closure-serialization round trip.
  val pair: Ordering[(Double, Long)] =
    (x: (Double, Long), y: (Double, Long)) => cmp(x._1, x._2, y._1, y._2)

  /** Same order over (score, id, payload) — the payload never ranks. */
  val carry: Ordering[(Double, Long, Long)] =
    (x: (Double, Long, Long), y: (Double, Long, Long)) => cmp(x._1, x._2, y._1, y._2)
}

/** Bounded top-k aggregator over (score, id) pairs.
  *
  * Replaces `ORDER BY score DESC LIMIT k` for top-k extraction: each
  * partition keeps at most k candidates (map-side partial aggregation),
  * merge is k+k selection — no global sort, no shuffle of anything
  * beyond per-partition k-vectors. At 100 TB this turns a full
  * range-partitioned sort of the aggregate into a single reduce of
  * (numPartitions × k) rows.
  *
  * Ordering is total — (score desc, id asc) — so results are
  * deterministic and oracle-comparable; see [[TopKOrder]].
  */
class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  // Invariant: every buffer trim() produced is sorted by TopKOrder.pair,
  // so buf.last is the current kth. The hot path — a full buffer seeing
  // a row no better than the kth — is a single compare, not an
  // O(k log k) re-sort per corpus row.
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && TopKOrder.pair.compare(in, buf.last) >= 0) buf else trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sorted(TopKOrder.pair).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(TopKOrder.pair)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopK]] with one extra carried Long column (score, id, payload):
  * top-k extraction where the winner rows need a rider attribute (e.g.
  * the IVF list a candidate came from). Ordering is identical —
  * [[TopKOrder]] over (score, id) — the payload never participates in
  * ranking, it just survives the per-partition trim and the k+k merges.
  */
class TopKCarry(k: Int)
    extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]] {

  override def zero: Seq[(Double, Long, Long)] = Vector.empty

  // same sorted-buffer invariant + O(1) hot-path compare as TopK.reduce
  override def reduce(buf: Seq[(Double, Long, Long)], in: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    if (buf.size >= k && TopKOrder.carry.compare(in, buf.last) >= 0) buf else trim(buf :+ in)

  override def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    trim(a ++ b)

  private def trim(xs: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    xs.sorted(TopKOrder.carry).take(k)

  override def finish(buf: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    buf.sorted(TopKOrder.carry)

  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
}
