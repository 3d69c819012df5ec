package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** q112 packing invariants beyond the oracle: the sequence stream is
  * gapless, every sequence but the tail is exactly full, and the token
  * budget reconciles with an independent per-doc recount.
  */
class SequencePackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.testdata("0.001")

  test("sequences are contiguous, full except the tail, and reconcile") {
    val rows = AnalyticsOps.q112SequencePacking.run(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // contiguous ids from 0
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq)
    // every sequence but the last carries exactly SeqLen tokens
    rows.init.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_tokens")) == AnalyticsOps.SeqLen,
        s"non-tail sequence ${r.getLong(0)} not full")
    }
    assert(rows.last.getLong(rows.last.fieldIndex("n_tokens")) <= AnalyticsOps.SeqLen)
    // token budget reconciles with an independent recount (+1 EOS/doc)
    val docs = Tables.documents(spark, sfDir).select("text").collect()
    val total = docs.map { r =>
      Option(r.getString(0)).map(_.trim.split("\\s+").length).getOrElse(0) + 1L
    }.sum
    assert(rows.map(r => r.getLong(r.fieldIndex("n_tokens"))).sum == total)
    // doc ranges chain: consecutive sequences overlap or abut on doc ids
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(b.fieldIndex("first_doc")) >= a.getLong(a.fieldIndex("first_doc")))
        assert(b.getLong(b.fieldIndex("first_doc")) <= a.getLong(a.fieldIndex("last_doc")) + 1)
      case _ => ()
    }
  }
}
