package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.TestSpark

/** First-principles fixtures for the BPE merge-learning operator: the
  * oracle gate proves engine parity; these prove the GREEDY semantics —
  * leftmost-first application on overlapping (doubled-symbol) matches,
  * the one place relational BPE can silently diverge from the
  * sequential algorithm.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (word, freq) rows → the round-0 symbol table (chars + sentinel). */
  private def symTable(words: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    words.toDF("w", "f")
      .select(col("w"), col("f"), posexplode(expr(
        "concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)), array('</w>'))")))
      .select(col("w"), col("f"), (col("pos") + 1).cast("long").as("p"), col("col").as("sym"))
  }

  private def seqOf(next: DataFrame, word: String): Seq[String] =
    next.filter(col("w") === word).orderBy(col("p"))
      .select(col("sym")).collect().map(_.getString(0)).toSeq

  test("doubled-symbol runs merge leftmost-first (the parity-island rule)") {
    val sv = symTable(Seq(("aaaa", 1L)))
    val top = TextOps.bpePairCounts(sv)
      .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
    val t = top.collect().head
    assert((t.getString(0), t.getString(1), t.getLong(2)) == (("a", "a", 3L)),
      "overlapping pair occurrences all count")
    val (next, kept) = TextOps.bpeApply(sv, top)
    // greedy BPE on a a a a: merge positions 1 and 3, NOT 2 — sequential
    // left-to-right would produce exactly (aa)(aa)</w>
    assert(kept.select(col("p")).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(seqOf(next, "aaaa") == Seq("aa", "aa", "</w>"))
  }

  test("odd-length run leaves the unpaired tail symbol intact") {
    val sv = symTable(Seq(("aaa", 1L)))
    val top = TextOps.bpePairCounts(sv)
      .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
    val (next, kept) = TextOps.bpeApply(sv, top)
    assert(kept.select(col("p")).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(seqOf(next, "aaa") == Seq("aa", "a", "</w>"))
  }

  test("non-overlapping pair merges everywhere; ties break lexicographically") {
    // "abab" (f=2) and "cd" (f=3): pair counts — (a,b): 4, (b,a): 2,
    // (b,</w>): 2, (c,d): 3, (d,</w>): 3. Winner (a,b).
    val sv = symTable(Seq(("abab", 2L), ("cd", 3L)))
    val pc = TextOps.bpePairCounts(sv).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pc(("a", "b")) == 4L && pc(("c", "d")) == 3L && pc(("b", "a")) == 2L)
    val top = TextOps.bpePairCounts(sv)
      .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
    val (next, kept) = TextOps.bpeApply(sv, top)
    assert(seqOf(next, "abab") == Seq("ab", "ab", "</w>"))
    assert(seqOf(next, "cd") == Seq("c", "d", "</w>"), "losing pair untouched")
    // n_merges weights by word frequency: 2 positions × f=2
    assert(kept.agg(sum(col("f"))).collect().head.getLong(0) == 4L)
  }
}
