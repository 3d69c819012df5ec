package graft.ingest

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.TestSpark

/** Schema evolution at the PARQUET SHARD layer — the read-side twin of
  * SchemaSync's DDL diffing: an append-only 100 TB corpus grows columns
  * over time, so old shards (written before the column existed) and new
  * shards must merge under one reader with NULL backfill, and the
  * merged scan must still prune columns per footer. Pins the exact
  * Spark contracts the ingestion design leans on:
  *
  *  - `mergeSchema=true` unions shard footers (new columns appended,
  *    shared columns position-independent);
  *  - rows from pre-evolution shards read as NULL in the new columns —
  *    so `count(col)` / `sum(col)` aggregate EXACTLY the post-evolution
  *    rows (the q138 null-accounting convention);
  *  - column pruning still reaches each shard's scan: projecting only
  *    v1 columns must not fail on (or read) the v2-only footers.
  */
class ParquetEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("evolving shards merge with NULL backfill and exact new-column aggregates") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-evolve").toString
    val v1 = Seq((1L, "alpha", "web"), (2L, "beta", "web"), (3L, "gamma", "api"))
      .toDF("doc_id", "text", "source")
    // the evolved shard adds a bigint token count and a string lang
    val v2 = Seq((10L, "delta east", "web", 2L, "en"), (11L, "eps", "api", 1L, "de"))
      .toDF("doc_id", "text", "source", "n_tokens", "lang")
    v1.write.parquet(s"$root/shard=old")
    v2.write.parquet(s"$root/shard=new")

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    val expected = Set("doc_id", "text", "source", "n_tokens", "lang", "shard")
    assert(merged.schema.fieldNames.toSet == expected,
      s"merged schema: ${merged.schema.fieldNames.toSet}")
    assert(merged.schema("n_tokens").dataType == LongType)

    // NULL backfill: v1 rows carry NULL in the evolved columns, so the
    // typed aggregates see exactly the v2 rows
    val row = merged.agg(
      count(lit(1)).as("n"),
      sum(when(col("n_tokens").isNull, 1L).otherwise(0L)).as("n_backfilled"),
      count(col("lang")).as("n_lang"),
      sum(col("n_tokens")).as("tok")).head()
    assert(row.getLong(0) == 5 && row.getLong(1) == 3
      && row.getLong(2) == 2 && row.getLong(3) == 3L, s"merged accounting: $row")

    // a v1-only projection over the merged corpus stays valid (and the
    // per-row values survive the merge untouched)
    val texts = merged.select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .as[(Long, String)].collect().toSeq
    assert(texts == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (10L, "delta east"), (11L, "eps")))

    // the 100 TB fast path: DECLARE the target schema instead of
    // footer-merging (mergeSchema reads every footer — O(shards) driver
    // work; a declared schema reads none). Old shards must backfill
    // NULL identically, so both reads produce the same accounting row.
    val declared = spark.read.schema(StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType), StructField("n_tokens", LongType),
      StructField("lang", StringType)))).parquet(root)
    val declaredRow = declared.agg(
      count(lit(1)).as("n"),
      sum(when(col("n_tokens").isNull, 1L).otherwise(0L)).as("n_backfilled"),
      count(col("lang")).as("n_lang"),
      sum(col("n_tokens")).as("tok")).head()
    assert(declaredRow == row,
      s"declared-schema read diverged from footer merge: $declaredRow vs $row")
  }
}
