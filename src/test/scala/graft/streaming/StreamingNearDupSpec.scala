package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The flagged SET itself (not just the judged per-source rollup)
    * must equal the batch candidate set: distinct doc_b of lshPairs.
    * Replayed file-by-file so the min-supersession path (an id below
    * the running min arriving in a LATER batch) is actually exercised.
    */
  test("streamed near-dup flags equal the batch LSH doc_b set") {
    import spark.implicits._
    val sfDir = TestSpark.testdata("0.01")
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val bands = graft.ext.TextOps.minhashBands(docs)
      .select(col("doc_id"), col("band_id").cast("integer").as("band_id"), col("bucket"))

    val dir = Files.createTempDirectory("graft-neardup-bands").toString
    // many small files => many micro-batches; repartition by a hash so
    // buckets are split ACROSS batches (not grouped), forcing the
    // cross-batch state path
    bands.repartition(8, col("doc_id")).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(bands.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .as[StreamingNearDup.BandRow]
    val q = StreamingNearDup.flagged(stream).toDF()
      .writeStream.format("memory").queryName("neardup_spec_sink")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("neardup_spec_sink")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val batchSet = graft.ext.TextOps.lshPairs(docs)
      .select("doc_b").distinct().collect().map(_.getLong(0)).toSet
    assert(batchSet.nonEmpty, "no candidate pairs at sf0.01 — test is vacuous")
    assert(streamed == batchSet,
      s"streamed-only=${streamed -- batchSet}, batch-only=${batchSet -- streamed}")
  }

  /** Replays engineered [[StreamingHammingDup.SigBandRow]]s one row per
    * micro-batch (each its own file, so the given sequence order IS the
    * arrival order) and returns the raw event sink.
    */
  private def replayHamDup(rows: Seq[StreamingHammingDup.SigBandRow],
      cap: Int, hamMax: Int, sinkName: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hamdup").toString
    rows.zipWithIndex.foreach { case (r, i) =>
      Seq(r).toDS().write.parquet(f"$dir/f$i%03d.parquet")
    }
    val schema = Seq.empty[StreamingHammingDup.SigBandRow].toDS().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      .as[StreamingHammingDup.SigBandRow]
    val q = StreamingHammingDup.flagged(stream, cap, hamMax).toDF()
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(sinkName)
  }

  /** The streamed-deltas-only consumer rollup (net per (bucket, id),
    * drop tombstoned buckets, keep net-positive) — THE production
    * helper, not a spec copy, so the assertions here certify the exact
    * code the judged q137/q153 consumers run.
    */
  private def surviving(events: org.apache.spark.sql.DataFrame): Set[Long] =
    StreamingHammingDup.survivingFlags(events)
      .collect().map(_.getLong(0)).toSet

  /** The TOTAL consumer (streamed deltas + re-seed of tombstoned
    * buckets from the live corpus) over engineered rows: liveBandRows
    * is admits minus purged ids, the at-rest membership the judged
    * q153 would hold post-purge.
    */
  private def exact(events: org.apache.spark.sql.DataFrame,
      admits: Seq[StreamingHammingDup.SigBandRow], purged: Set[Long],
      cap: Int, hamMax: Int): Set[Long] = {
    import spark.implicits._
    val live = admits.filterNot(r => purged.contains(r.media_id))
      .toDS().toDF().drop("purge")
    StreamingHammingDup.exactFlags(events, live, cap, hamMax)
      .collect().map(_.getLong(0)).toSet
  }

  /** Batch semantics brute-forced in memory: pairs within hamMax inside
    * buckets whose POST-PURGE membership is what `rows` admits minus
    * purges, cap filter per the given bucket-size definition.
    */
  private def bruteForce(admits: Seq[StreamingHammingDup.SigBandRow],
      purged: Set[Long], cap: Int, hamMax: Int): Set[Long] =
    admits.filterNot(r => purged.contains(r.media_id))
      .groupBy(r => (r.band, r.v)).filter(_._2.size <= cap)
      .values.flatMap { ms =>
        for {
          x <- ms; y <- ms
          if x.media_id < y.media_id &&
            java.lang.Long.bitCount(x.sig ^ y.sig) <= hamMax
        } yield y.media_id
      }.toSet

  /** Forced-saturation equivalence for [[StreamingHammingDup]]: the
    * batch cap drops an over-cap bucket ENTIRELY (`HAVING count(*) <=
    * cap`), and the streaming operator must converge to the same set
    * even though some of the bucket's flags were already emitted before
    * it overflowed — that is exactly what the saturation tombstone
    * cancels. Engineered buckets: one saturating (cap + 2 mutually-near
    * members — its early flags MUST be cancelled), one at exactly the
    * cap (kept: HAVING is ≤), one small mixed bucket where only some
    * pairs are within hamMax. Replayed one row per micro-batch in an
    * adversarial NON-ascending id order, so flags are emitted both
    * forward and retroactively before the tombstone lands.
    */
  test("hamming-dup saturation tombstones reproduce the batch cap exactly") {
    val cap = 4
    val hamMax = 2
    def row(id: Long, sig: Long, band: Int, v: Long) =
      StreamingHammingDup.SigBandRow(id, sig, band, v, purge = false)
    // bucket A (band 0, v 10): 6 members > cap, all sig-identical
    val a = (1 to 6).map(i => row(100L + i, 0xF0L, 0, 10L))
    // bucket B (band 0, v 20): exactly cap members, all near
    val b = (1 to 4).map(i => row(200L + i, 0x0FL, 0, 20L))
    // bucket C (band 1, v 30): 3 members, only (301, 302) within hamMax
    val c = Seq(row(301L, 0x00L, 1, 30L), row(302L, 0x01L, 1, 30L),
      row(303L, 0xFFL, 1, 30L))
    // adversarial order: interleave buckets, ids descending within A so
    // the retroactive (larger-id-mate) emission path fires pre-tombstone
    val events = replayHamDup(a.reverse ++ c ++ b.reverse, cap, hamMax, "hamdup_sat_sink")

    // pre-tombstone flags from bucket A must exist in the raw sink —
    // otherwise the cancellation path was never exercised
    val rawA = events.filter(!col("tomb") && col("v") === 10L).count()
    assert(rawA > 0, "saturating bucket emitted no pre-tombstone flags — test is vacuous")
    val tombs = events.filter(col("tomb")).select("band", "v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(tombs == Set((0, 10L)), s"expected exactly bucket A tombstoned, got $tombs")

    val batch = bruteForce(a ++ b ++ c, Set.empty, cap, hamMax)
    assert(batch == Set(202L, 203L, 204L, 302L), s"brute-force sanity: $batch")
    val survived = surviving(events)
    assert(survived == batch,
      s"streamed-only=${survived -- batch}, batch-only=${batch -- survived}")
    // the TOTAL consumer's over-cap-live case: bucket A is tombstoned
    // AND still over the cap live, so the re-seed leg must contribute
    // nothing — exactFlags equals the batch set here too
    assert(exact(events, a ++ b ++ c, Set.empty, cap, hamMax) == batch,
      "exactFlags diverged from batch on an over-cap-live tombstoned bucket")
  }

  /** q153's purge protocol under adversarial interleavings: retraction
    * of a survivor whose only near mate was purged, retention when a
    * second justification remains, purge-before-admit commutativity,
    * re-flagging after a retraction when a NEW smaller near mate
    * arrives, and the purged id's own flag netting to zero. Each
    * scenario is checked against the in-memory batch brute force over
    * the post-purge membership — the same equivalence the judged q153
    * certifies on the real corpus.
    */
  test("hamming-dup purge retracts, retains, re-flags and commutes with admits") {
    val cap = 8
    val hamMax = 2
    def admit(id: Long, sig: Long, v: Long) =
      StreamingHammingDup.SigBandRow(id, sig, 0, v, purge = false)
    def purge(id: Long, sig: Long, v: Long) =
      StreamingHammingDup.SigBandRow(id, sig, 0, v, purge = true)

    // bucket 1: 10 near 20 near 30 (all sig-equal). Purge 10 AFTER all
    // admits: 20's only smaller mate dies -> retract 20; 30 keeps 20 as
    // mate -> stays flagged. Purged 10 was never flagged (smallest).
    // bucket 2: purge 50 BEFORE its admit arrives; 60 near 50 would
    // have been flagged by it -> must NOT be flagged (50 never alive).
    // bucket 3: 70 flagged by 65; purge 65 (retract 70); then admit 62
    // (near 70, smaller) -> 70 RE-FLAGGED (net +1 again).
    val rows = Seq(
      admit(10L, 0xAAL, 1L), admit(20L, 0xAAL, 1L), admit(30L, 0xAAL, 1L),
      purge(10L, 0xAAL, 1L),
      purge(50L, 0xBBL, 2L), admit(50L, 0xBBL, 2L), admit(60L, 0xBBL, 2L),
      admit(65L, 0xCCL, 3L), admit(70L, 0xCCL, 3L),
      purge(65L, 0xCCL, 3L), admit(62L, 0xCCL, 3L))
    val events = replayHamDup(rows, cap, hamMax, "hamdup_purge_sink")

    // the retraction path genuinely fired (some -1 delta in the sink)
    assert(events.filter(col("delta") === -1).count() >= 2,
      "no retractions emitted — the purge path is vacuous")
    // 70's flag toggled on -> off -> on: three deltas netting to +1
    val d70 = events.filter(col("media_id") === 70L).select("delta")
      .collect().map(_.getInt(0)).toSeq
    assert(d70.sorted == Seq(-1, 1, 1), s"expected 70 to re-flag, deltas: $d70")

    val admits = rows.filter(!_.purge)
    val purgedIds = rows.filter(_.purge).map(_.media_id).toSet
    val batch = bruteForce(admits, purgedIds, cap, hamMax)
    assert(batch == Set(30L, 70L), s"brute-force sanity: $batch")
    val survived = surviving(events)
    assert(survived == batch,
      s"streamed-only=${survived -- batch}, batch-only=${batch -- survived}")
    // no bucket tombstoned here, so the TOTAL consumer's re-seed leg
    // runs empty and exactFlags must coincide with the deltas alone
    assert(exact(events, admits, purgedIds, cap, hamMax) == batch,
      "exactFlags diverged from survivingFlags with no tombstones")
  }

  /** The saturate → purge-below-cap → re-seed certificate. In STREAMING
    * state the contract is conservative: a saturated bucket stays dead
    * even when purges bring its live membership back under the cap
    * (members were dropped — reviving it from state alone is
    * impossible). That half is pinned first: the deltas-only consumer
    * returns nothing. The RE-SEED maintenance leg
    * ([[StreamingHammingDup.reseedFlags]], the q136 convention) then
    * recomputes exactly the tombstoned bucket from the live at-rest
    * corpus, and the TOTAL consumer must equal the batch
    * `HAVING count(*) <= cap` answer — which KEEPS this bucket (live
    * count 2 ≤ cap 3) and flags the larger of the near pair. Both-ways
    * degeneration guards: the tombstone genuinely fired, the batch set
    * is genuinely non-empty (so survivingFlags alone genuinely
    * diverges and the re-seed leg is load-bearing, not vacuous).
    */
  test("hamming-dup saturated bucket purged below cap is revived by the re-seed leg") {
    val cap = 3
    val hamMax = 2
    def admit(id: Long, v: Long) =
      StreamingHammingDup.SigBandRow(id, 0xEEL, 0, v, purge = false)
    def purge(id: Long, v: Long) =
      StreamingHammingDup.SigBandRow(id, 0xEEL, 0, v, purge = true)
    // 5 admits saturate (cap 3), then 3 purges bring live count to 2
    val rows = (1 to 5).map(i => admit(i.toLong, 7L)) ++
      (1 to 3).map(i => purge(i.toLong, 7L))
    val events = replayHamDup(rows, cap, hamMax, "hamdup_dead_sink")
    assert(events.filter(col("tomb")).count() == 1, "bucket never tombstoned")
    // streaming-state half of the contract: conservatively dead
    assert(surviving(events).isEmpty,
      "saturated bucket emitted surviving flags after purge")

    val admits = rows.filter(!_.purge)
    val purgedIds = rows.filter(_.purge).map(_.media_id).toSet
    val batch = bruteForce(admits, purgedIds, cap, hamMax)
    // live members are {4, 5} (sig-equal): batch keeps the bucket and
    // flags 5 — non-empty, so the divergence the re-seed closes is real
    assert(batch == Set(5L), s"brute-force sanity: $batch")
    val total = exact(events, admits, purgedIds, cap, hamMax)
    assert(total == batch,
      s"re-seeded-only=${total -- batch}, batch-only=${batch -- total}")
  }
}
