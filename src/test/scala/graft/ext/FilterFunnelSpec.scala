package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q113 funnel invariants: stage survivals are monotone non-increasing
  * (each gate only removes), bounded by n_docs, and the first gate's
  * count matches an independent recount.
  */
class FilterFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.testdata("0.001")

  test("funnel stages are monotone and reconcile") {
    val rows = TextOps.q113FilterFunnel.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val stages = Seq("pass_len", "pass_tok", "pass_stop", "pass_ttr", "pass_punct")
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      val vals = stages.map(s => r.getLong(r.fieldIndex(s)))
      assert(vals.head <= n)
      vals.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a, s"funnel grew at ${r.getString(0)}: $vals")
        case _ => ()
      }
    }
    // independent recount of gate 1 (>=100 chars) across all sources
    val expected = graft.tables.Tables.documents(spark, sfDir)
      .select("text").collect()
      .count(r => Option(r.getString(0)).exists(_.length >= 100))
    assert(rows.map(r => r.getLong(r.fieldIndex("pass_len"))).sum == expected)
  }
}
