package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Guards for the q157 streaming shard-ingest composition beyond the
  * oracle gate. The oracle replays the admission chain from the
  * generator, so two failure modes stay oracle-invisible:
  *
  *  - a DEGENERATE corpus (no dup of either kind) keeps every row green
  *    while certifying nothing — pinned against the real corpus here;
  *  - the VERDICT PRIORITY (dup_of_corpus ≻ dup_in_batch) is never
  *    exercised by the judged corpora (no doc is both; verified at
  *    sf0.001/0.01 when this spec was written), so a consumer that
  *    flipped the priority — or unioned the two flag kinds into one —
  *    would stay green at the gate. The engineered corpus below forces
  *    the overlap: identical texts collide on ALL bands, so doc 13 is
  *    simultaneously a corpus-dup (of doc 1) and an in-batch dup (of
  *    doc 10) and MUST report dup_of_corpus.
  */
class StreamingShardIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q157 judged row is non-degenerate at sf0.001") {
    val rows = graft.SparkEntry.queries("q157_streaming_shard_ingest")(
      spark, TestSpark.testdata("0.001")).collect()
    def tot(c: String) = rows.map(r => r.getLong(r.fieldIndex(c))).sum
    assert(tot("equiv_diff") == 0L)
    assert(tot("n_dup_corpus") > 0L, "no corpus dup — the static probe leg is vacuous")
    assert(tot("n_dup_batch") > 0L, "no in-batch dup — the stateful leg is vacuous")
    assert(tot("n_admitted") > 0L && tot("n_admitted") < tot("n_shard"),
      "admission must be a proper subset of the shard")
  }

  test("engineered overlap: dup_of_corpus wins the priority, streamed == batch") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon"
    val b = "lambda mu nu xi omicron"
    val docs = Seq(
      (1L, a), (2L, "zeta eta theta iota kappa"), // corpus (doc_id < 10)
      (10L, a), // dup_of_corpus (all bands collide with doc 1)
      (11L, b), // new: its only mate has a LARGER id
      (12L, b), // dup_in_batch (mate 11)
      (13L, a), // BOTH kinds (corpus doc 1 AND smaller shard mate 10)
      (14L, "rho sigma tau upsilon phi")) // new
      .toDF("doc_id", "text")
      .withColumn("source", lit("spec")).withColumn("lang", lit("en"))
    val streamed = StreamingQueries
      .shardIngestStatuses(spark, docs, t = 10L, "q157spec", TestSpark.testdata("0.001"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = Map(10L -> "dup_of_corpus", 11L -> "new",
      12L -> "dup_in_batch", 13L -> "dup_of_corpus", 14L -> "new")
    assert(streamed == expected, s"streamed=$streamed")
    // the certificate on the bait: the batch verdicts frame q157
    // compares against must agree on the engineered overlap too
    val batch = graft.ext.TextOps.admissionVerdicts(docs, 10L)
      .select(col("doc_id"), col("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch == expected, s"batch=$batch")
  }
}
