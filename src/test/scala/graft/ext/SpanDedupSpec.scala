package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** First-principles fixtures for the exact repeated-span operators: the
  * DuckDB gate proves engine parity, these prove the operators MEAN
  * what they claim — maximal runs, island splits, and coverage merges
  * computed by hand on documents with engineered overlaps.
  *
  * Fixture corpus (unique synthetic words, so no accidental grams):
  *   doc 0: a1..a30                            (the source text)
  *   doc 1: b1..b5, a5..a24, b6..b10           (one 20-token shared span)
  *   doc 2: a1..a30                            (full verbatim copy)
  *   doc 3: a1..a10, a15..a30                  (two spans: 10 and 16 toks,
  *                                              split by a gap — grams
  *                                              crossing a10→a15 match
  *                                              nothing)
  *   doc 4: c1..c30                            (no overlap at all)
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def words(prefix: String, from: Int, to: Int): Seq[String] =
    (from to to).map(i => s"$prefix$i")

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_span_spec")
    sys.addShutdownHook(graft.core.Fs.deleteRecursively(dir)): Unit
    import spark.implicits._
    val docs = Seq(
      (0L, words("a", 1, 30).mkString(" ")),
      (1L, (words("b", 1, 5) ++ words("a", 5, 24) ++ words("b", 6, 10)).mkString(" ")),
      (2L, words("a", 1, 30).mkString(" ")),
      (3L, (words("a", 1, 10) ++ words("a", 15, 30)).mkString(" ")),
      (4L, words("c", 1, 30).mkString(" ")))
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'spec' AS source",
        "cast(length(text) AS bigint) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("q119 finds hand-computed maximal runs and splits on gaps") {
    val rows = graft.SparkEntry.queries("q119_repeated_spans")(spark, fixtureDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // (max_run, n_runs, total_run_toks)
    assert(rows((0L, 1L)) == ((20L, 1L, 20L)), "one 20-token span")
    assert(rows((0L, 2L)) == ((30L, 1L, 30L)), "full copy = one 30-token run")
    // doc 3 vs the full text: the 10-token span stays a SEPARATE island
    // (grams crossing its internal gap match nothing), so n_runs = 2
    // and only the 16-token span reaches max_run
    assert(rows((0L, 3L)) == ((16L, 2L, 26L)), "gap splits the runs")
    assert(rows((1L, 2L)) == ((20L, 1L, 20L)))
    assert(rows((2L, 3L)) == ((16L, 2L, 26L)))
    // the doc1∩doc3 overlap tops out at 10 tokens < MinRun — excluded
    assert(!rows.contains((1L, 3L)), "sub-threshold pair must not report")
    assert(!rows.keys.exists(k => k._1 == 4L || k._2 == 4L), "no-overlap doc")
  }

  test("q121 coverage merges overlapping matches and splits on gaps") {
    val rows = graft.SparkEntry.queries("q121_span_coverage")(spark, fixtureDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // (covered_tokens, doc_tokens, coverage)
    assert(rows(0L) == ((30L, 30L, 1.0)), "full copy partner covers doc 0 entirely")
    assert(rows(2L) == ((30L, 30L, 1.0)))
    assert(rows(1L)._1 == 20L && rows(1L)._2 == 30L, "only the shared span is covered")
    assert(rows(1L)._3 == 20.0 / 30.0)
    // doc 3: islands of 10 and 16 tokens merge to 26 of its 26 tokens
    assert(rows(3L) == ((26L, 26L, 1.0)))
    assert(!rows.contains(4L), "no-overlap doc must not report")
  }
}
