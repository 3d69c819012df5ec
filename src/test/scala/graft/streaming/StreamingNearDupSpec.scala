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
}
