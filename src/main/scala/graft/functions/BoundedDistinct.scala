package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Distinct-set aggregator with a hard size bound: collects the distinct
  * input values per group but never holds more than `bound` of them.
  *
  * The point is df-capped candidate generation (q20): a group whose true
  * distinct count is ≤ bound−1 is collected EXACTLY — every partial is a
  * subset of the true set, so the bound never truncates it — while a
  * hot group (a boilerplate shingle shared by millions of docs at
  * 100 TB) saturates at `bound` elements and stops growing, instead of
  * materializing a multi-MB array row in the aggregation buffer. The
  * caller filters `size(set) <= bound−1`, so saturated groups are
  * discarded and WHICH elements survived truncation never matters.
  *
  * Map-side combinable: partials are bounded sets, merge is a truncated
  * union — shuffle traffic per group is O(bound) regardless of skew.
  */
class BoundedDistinct(bound: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(bound > 0, s"bound must be positive, got $bound")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] =
    if (buf.size >= bound || buf.contains(in)) buf else buf :+ in

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    var out = a
    val it = b.iterator
    while (out.size < bound && it.hasNext) {
      val x = it.next()
      if (!out.contains(x)) out = out :+ x
    }
    out
  }

  // sorted output: downstream pair generation (explode²) and set-size
  // joins are order-insensitive, but a deterministic array makes dumps
  // and plans reproducible run-over-run
  override def finish(buf: Seq[Long]): Seq[Long] = buf.sorted

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
