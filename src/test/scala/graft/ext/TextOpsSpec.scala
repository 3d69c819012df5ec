package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Cross-checks for the text operators that the DuckDB oracle gate can't
  * express directly — in particular the EXACT (uncapped) n-gram Jaccard,
  * which the judged q20 deliberately no longer computes (its universe is
  * df-capped for scale; see `TextOps.JaccardDfCap`). Here the uncapped
  * plan is validated against an in-memory brute-force over every
  * same-source pair, so the exact semantics stay covered test-only.
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01: the 500-doc corpus — big enough to actually contain
  // near-dup pairs (sf0.001's 50 docs can come up empty), small enough
  // for a 500²-pair in-memory brute force
  private val sfDir = TestSpark.testdata("0.01")

  test("uncapped jaccardPairs matches brute-force exact Jaccard") {
    val docs = Tables.documents(spark, sfDir)

    // brute force: same trigram scheme (whitespace tokens, word
    // 3-shingles, docs with <3 tokens excluded), every same-source pair
    val sets = docs.select("doc_id", "source", "text").collect().toSeq
      .map { r =>
        val w = r.getString(2).trim.split("\\s+")
        val sh = (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
        (r.getLong(0), r.getString(1), sh)
      }
      .filter(_._3.nonEmpty)
    val expected = (for {
      (ida, srca, sa) <- sets
      (idb, srcb, sb) <- sets
      if srca == srcb && ida < idb
      inter = (sa & sb).size
      if inter > 0
      jac = inter.toDouble / (sa.size + sb.size - inter).toDouble
      if jac >= 0.5
    } yield (ida, idb, inter.toLong, jac)).toSet

    val got = TextOps.jaccardPairs(docs, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(expected.nonEmpty, "corpus produced no exact near-dup pairs; test is vacuous")
    assert(got == expected)
  }

  test("capped intersections never exceed the exact ones") {
    // The judged cap only REMOVES shingles from the universe, so every
    // capped pair's n_common is bounded by its exact intersection — the
    // invariant that makes "capped jaccard high ⇒ genuinely similar
    // modulo boilerplate" sound.
    val docs = Tables.documents(spark, sfDir)
    val exact = TextOps.jaccardPairs(docs, Int.MaxValue)
      .select("doc_a", "doc_b", "n_common").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val capped = TextOps.jaccardPairs(docs, TextOps.JaccardDfCap)
      .select("doc_a", "doc_b", "n_common").collect()
    assert(capped.nonEmpty, "capped q20 produced no pairs at sf0.001; test is vacuous")
    capped.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      exact.get(k).foreach(n =>
        assert(r.getLong(2) <= n, s"pair $k grew its intersection under the cap"))
    }
  }
}
