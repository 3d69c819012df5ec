package graft.schemasync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

import graft.QuerySpec
import graft.state.StateTable
import graft.tables.Tables

/** q160: the schema-evolution certificate — the q156/q158 convention
  * applied to [[SchemaSync.sync]], closing the last spec-only SURVEY §2
  * operator (S7). The reference's sync flow (`flows/schema_sync.py:
  * 102–155`) runs ALTER TABLE ADD/DROP against Postgres before every
  * ingest (`main.py` sequencing, R4); here the same declared-schema diff
  * drives a versioned-store rewrite, and the certificate judges the
  * full production ordering through the REAL store:
  *
  *  1. first load under the OLD schema (key, price, legacy_note) — v1;
  *  2. declared schema changes: ADD `o_quant` (NULL backfill on every
  *     existing row) and DROP `legacy_note` (not protected) in ONE sync
  *     — v2; the applied change set is require-pinned, so a diff
  *     regression surfaces as a named failure, not an oracle mismatch;
  *  3. ingest a batch CARRYING the new column through the real upsert
  *     (evolve-then-ingest: LWW updates overwrite price and fill quant,
  *     unseen keys insert with quant; untouched rows keep the NULL
  *     backfill) — v3;
  *  4. a repeat sync is a NO-OP (no fourth version — idempotence);
  *  5. a sync against a declared schema MISSING the key column, with
  *     the key protected, drops NOTHING (PK protection,
  *     `flows/schema_sync.py:144`) and writes no version.
  *
  * The judged (metric, value) rows pin the final contents (row/key/
  * price-cent/quant aggregates — NULL-backfill visible as
  * `quant_null_rows`), the final physical column set (legacy gone,
  * quant present), and the version accounting for every step. The
  * oracle replays the upsert algebra over the fixture slices and pins
  * the contract constants.
  *
  * Scale: sync's ADD is a metadata-cheap projection and its DROP is the
  * one honest full rewrite parquet requires (single column-pruned
  * scan→write, no shuffle); the certificate's judged plan is one store
  * scan into a 1-row rollup plus constant frames. SchemaSyncCertSpec
  * pins what the oracle can't see: the pre-sync version really carried
  * populated legacy_note rows (time-travel read), and the NULL backfill
  * is distinguishable from an all-NULL ingest.
  */
object SchemaSyncQueries {

  private val DeclaredNew = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_totalprice", DoubleType),
    StructField("o_quant", IntegerType)))

  val q160SchemaEvolutionCert: QuerySpec = QuerySpec(
    (s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      def ord(df: DataFrame): DataFrame = df.withColumn("ord", col("o_orderkey"))
      val st = new StateTable(s,
        graft.core.Staging.invocationDir("graft_q160_state", dir),
        Seq("o_orderkey"))

      // v1: first load under the OLD schema
      st.upsert(ord(o.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("legacy_note",
          concat(lit("n"), (col("o_orderkey") % 4).cast("string")))), Some("ord"))
      val vAfterLoad = st.history().size.toLong

      // v2: one sync applies ADD o_quant + DROP legacy_note
      val changes = SchemaSync.sync(s, st, DeclaredNew,
        protectedCols = Set("o_orderkey"))
      require(changes.toSet == Set[SchemaSync.SchemaChange](
        SchemaSync.AddColumn(StructField("o_quant", IntegerType)),
        SchemaSync.DropColumn("legacy_note")),
        s"q160 precondition: sync applied unexpected changes $changes — " +
          "the evolution scenario no longer exercises ADD+DROP")
      val vAfterSync = st.history().size.toLong

      // v3: evolve-then-ingest — the batch carries the new column
      st.upsert(ord(o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
        .withColumn("o_quant", (col("o_orderkey") % 50).cast("int"))), Some("ord"))
      val vAfterIngest = st.history().size.toLong

      // idempotence: re-sync is a no-op, no new version
      require(SchemaSync.sync(s, st, DeclaredNew, Set("o_orderkey")).isEmpty,
        "q160 precondition: repeat sync was not a no-op")
      val vAfterNoop = st.history().size.toLong

      // PK protection: a declared schema missing the key must not drop it
      require(SchemaSync.sync(s, st,
        StructType(DeclaredNew.filterNot(_.name == "o_orderkey")),
        Set("o_orderkey")).isEmpty,
        "q160 precondition: key-protected sync emitted changes")
      val vAfterProtected = st.history().size.toLong

      val post = st.current().get
      val cols = post.columns.toSeq
      val agg = post.agg(
        count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("ks"),
        sum(floor(col("o_totalprice") * lit(100)).cast("long")).as("pc"),
        sum(when(col("o_quant").isNull, 1L).otherwise(0L)).as("qn"),
        sum(coalesce(col("o_quant").cast("long"), lit(0L))).as("qs"))
      val contentRows = agg.select(explode(map(
        lit("rows_final"), col("n"),
        lit("key_sum_final"), col("ks"),
        lit("price_cents_final"), col("pc"),
        lit("quant_null_rows"), col("qn"),
        lit("quant_sum"), col("qs"))).as(Seq("metric", "value")))
      val contractRows = s.range(1).select(explode(map(
        lit("n_cols_final"), lit(cols.length.toLong),
        lit("legacy_present"), lit(if (cols.contains("legacy_note")) 1L else 0L),
        lit("quant_present"), lit(if (cols.contains("o_quant")) 1L else 0L),
        lit("versions_after_first_load"), lit(vAfterLoad),
        lit("versions_after_sync"), lit(vAfterSync),
        lit("versions_after_ingest"), lit(vAfterIngest),
        lit("versions_after_noop_sync"), lit(vAfterNoop),
        lit("versions_after_protected_sync"), lit(vAfterProtected))).as(Seq("metric", "value")))
      contentRows.unionByName(contractRows).orderBy(col("metric"))
    },
    s"""WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
       |              WHERE o_orderkey % 3 <> 0),
       |batch AS (SELECT o_orderkey AS k, o_totalprice * cast(1.1 AS double) AS p,
       |                 cast(o_orderkey % 50 AS integer) AS q FROM orders
       |          WHERE o_orderkey % 2 = 0),
       |-- final contents: LWW updates + NULL-backfilled untouched rows +
       |-- inserts carrying the new column
       |fin AS (SELECT b.k, coalesce(u.p, b.p) AS price, u.q AS quant
       |        FROM base b LEFT JOIN batch u ON b.k = u.k
       |        UNION ALL
       |        SELECT k, p, q FROM batch
       |        WHERE k NOT IN (SELECT k FROM base))
       |SELECT metric, value FROM (
       |  SELECT 'rows_final' AS metric, cast(count(*) AS bigint) AS value FROM fin
       |  UNION ALL SELECT 'key_sum_final', ${graft.ext.OracleSql.bigSum("k")} FROM fin
       |  UNION ALL SELECT 'price_cents_final',
       |    ${graft.ext.OracleSql.bigSum("cast(floor(price * 100) AS bigint)")} FROM fin
       |  UNION ALL SELECT 'quant_null_rows',
       |    cast(count(*) FILTER (quant IS NULL) AS bigint) FROM fin
       |  UNION ALL SELECT 'quant_sum', ${graft.ext.OracleSql.bigSum("coalesce(quant, 0)")} FROM fin
       |  UNION ALL SELECT 'n_cols_final', cast(3 AS bigint)
       |  UNION ALL SELECT 'legacy_present', cast(0 AS bigint)
       |  UNION ALL SELECT 'quant_present', cast(1 AS bigint)
       |  UNION ALL SELECT 'versions_after_first_load', cast(1 AS bigint)
       |  UNION ALL SELECT 'versions_after_sync', cast(2 AS bigint)
       |  UNION ALL SELECT 'versions_after_ingest', cast(3 AS bigint)
       |  UNION ALL SELECT 'versions_after_noop_sync', cast(3 AS bigint)
       |  UNION ALL SELECT 'versions_after_protected_sync', cast(3 AS bigint)
       |) ORDER BY metric""".stripMargin)

  val all: Map[String, QuerySpec] = Map(
    "q160_schema_evolution_cert" -> q160SchemaEvolutionCert)
}
