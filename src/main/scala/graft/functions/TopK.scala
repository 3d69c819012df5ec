package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

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
  * deterministic and oracle-comparable.
  */
class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  // Invariant: every buffer trim() produced is sorted by (score desc,
  // id asc), so buf.last is the current kth. The hot path — a full
  // buffer seeing a row no better than the kth — is a single compare,
  // not an O(k log k) re-sort per corpus row.
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && !beats(in, buf.last)) buf else trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  // MUST agree with trim's sort key exactly — including NaN and signed
  // zero, where IEEE `>` and the total order disagree (a NaN kth entry
  // under IEEE compare would permanently reject every better row). Uses
  // the identical negated-score total-order compare as sortBy.
  private def beats(x: (Double, Long), y: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(-x._1, -y._1)
    c < 0 || (c == 0 && x._2 < y._2)
  }

  // ordering summoned statically per call (a captured Ordering field does
  // not survive the aggregator's closure-serialization round trip)
  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (score, id) => (-score, id) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopK]] with one extra carried Long column (score, id, payload):
  * top-k extraction where the winner rows need a rider attribute (e.g.
  * the IVF list a candidate came from). Ordering is identical —
  * (score desc, id asc) — the payload never participates in ranking, it
  * just survives the per-partition trim and the k+k merges.
  */
class TopKCarry(k: Int)
    extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]] {

  override def zero: Seq[(Double, Long, Long)] = Vector.empty

  // same sorted-buffer invariant + O(1) hot-path compare as TopK.reduce
  override def reduce(buf: Seq[(Double, Long, Long)], in: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    if (buf.size >= k && !beats(in, buf.last)) buf else trim(buf :+ in)

  override def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    trim(a ++ b)

  // total-order compare, identical to trim's sort key (see TopK.beats)
  private def beats(x: (Double, Long, Long), y: (Double, Long, Long)): Boolean = {
    val c = java.lang.Double.compare(-x._1, -y._1)
    c < 0 || (c == 0 && x._2 < y._2)
  }

  private def trim(xs: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    xs.sortBy { case (score, id, _) => (-score, id) }.take(k)

  override def finish(buf: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    buf.sortBy { case (score, id, _) => (-score, id) }

  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
}
