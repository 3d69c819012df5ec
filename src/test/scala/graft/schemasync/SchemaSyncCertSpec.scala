package graft.schemasync

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

import graft.TestSpark
import graft.state.StateTable

/** Guards for the q160 schema-evolution certificate beyond the oracle
  * gate. The oracle replays the upsert algebra and pins the contract
  * constants, so what it cannot see is the store history behind the
  * final row: that the pre-sync version really carried populated legacy
  * data (the DROP destroyed something real), that the ADD's NULL
  * backfill landed on the retained v2 (not merely on the post-ingest
  * v3), and that the bookkeeping `_seq` column survived the evolution
  * rewrite — the LWW continuity a sync must never reset.
  */
class SchemaSyncCertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q160 certificate rows are non-degenerate") {
    val sf = TestSpark.testdata("0.001")
    val rows = graft.SparkEntry.queries("q160_schema_evolution_cert")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 13)
    assert(rows("quant_null_rows") > 0L,
      "no NULL-backfilled rows — every base row was updated, the ADD leg is vacuous")
    assert(rows("quant_sum") > 0L, "no ingested quant values — the evolve-then-ingest leg is vacuous")
    assert(rows("rows_final") > rows("quant_null_rows"),
      "no row carries a quant value")
    assert(rows("versions_after_first_load") == 1L &&
      rows("versions_after_sync") == 2L &&
      rows("versions_after_ingest") == 3L &&
      rows("versions_after_noop_sync") == 3L &&
      rows("versions_after_protected_sync") == 3L)
    assert(rows("legacy_present") == 0L && rows("quant_present") == 1L &&
      rows("n_cols_final") == 3L)
  }

  test("evolution rewrite preserves history semantics the judged row summarizes") {
    val sf = TestSpark.testdata("0.001")
    val o = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val st = new StateTable(spark,
      graft.core.Staging.invocationDir("graft_sync_cert_spec", sf),
      Seq("o_orderkey"))
    st.upsert(o.filter(col("o_orderkey") % 3 =!= 0)
      .withColumn("legacy_note", concat(lit("n"), (col("o_orderkey") % 4).cast("string")))
      .withColumn("ord", col("o_orderkey")), Some("ord"))
    val v1 = st.currentVersion.get

    val declared = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_quant", IntegerType)))
    val changes = SchemaSync.sync(spark, st, declared, Set("o_orderkey"))
    assert(changes.size == 2)
    val v2 = st.currentVersion.get

    // the DROP destroyed real data: v1's legacy_note was populated on
    // every row (readVersion = time travel; versions immutable pre-vacuum)
    val v1df = st.readVersion(v1)
    assert(v1df.columns.contains("legacy_note") && !v1df.columns.contains("o_quant"))
    assert(v1df.filter(col("legacy_note").isNull).limit(1).count() == 0L,
      "v1 legacy_note had NULLs — the dropped column was not demonstrably populated")

    // the ADD backfilled NULLs on the RETAINED v2 (before any ingest)
    val v2df = st.readVersion(v2)
    assert(v2df.columns.contains("o_quant") && !v2df.columns.contains("legacy_note"))
    assert(v2df.filter(col("o_quant").isNotNull).limit(1).count() == 0L,
      "v2 o_quant must be pure NULL backfill")

    // LWW continuity: the rewrite preserved _seq exactly
    def seqSum(v: String) = spark.read
      .parquet(java.nio.file.Paths.get(st.root).resolve(v).toString)
      .agg(sum(col(StateTable.SeqCol))).head().getLong(0)
    assert(seqSum(v1) == seqSum(v2),
      "sync rewrite perturbed _seq — LWW ordering would reset across an evolution")
  }
}
