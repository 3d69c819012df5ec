package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.tables.Tables

/** q159: the CSV-ingestion certificate — the judged gate for the S1/P1–P5
  * cleaning contract that was previously spec-only (the one SURVEY §2
  * block a user hits on every single load).
  *
  * The fixture stages a real landing directory of orders-shaped CSV text
  * with every reference ingestion hazard baked in at byte level, derived
  * deterministically from the orders table so the oracle can replay the
  * generator (staged stores are process-scoped and swept before the
  * oracle runs, so — as with every staged query — the oracle replays the
  * derivation, it does not re-read the staging):
  *
  *  - camelCase headers, one per part file (`flows/utils.py:4–5` rename;
  *    multi-file landing dirs mean the reader must skip a header line in
  *    EVERY file, not just the first);
  *  - both ISO-8601 precision variants the reference corpus mixes
  *    (`flows/data_ingestion.py:86–91`): with-seconds
  *    `2024-01-02T03:04:05Z` on even keys, seconds-less
  *    `2024-01-02T03:04Z` on odd keys — one `timestampFormat` cannot
  *    express both, which is exactly what [[graft.core.Schemas.parseDateTime]]'s
  *    coalesce exists for;
  *  - UNQUOTED empty fields (campaign on keys ≡ 0 mod 5) that must land
  *    as NULL (pandas NaN→None parity, `flows/data_ingestion.py:109–112`);
  *  - QUOTED fields containing the delimiter (`"camp,N"`) that must
  *    round-trip through RFC-4180 unquoting intact — a broken quote path
  *    shifts every following column and poisons the timestamp parse,
  *    which the judged `n_ts_null = 0` pins;
  *  - verbatim duplicate lines (keys ≡ 0 mod 11 emitted twice): the
  *    reader preserves multiplicity — dedup belongs to the upsert layer
  *    (§2.4), never the reader;
  *  - numeric round-trips: int quantity, two-decimal double
  *    shippingCost, full-precision double amount (shortest-round-trip
  *    double formatting on write, so parse-back is bit-exact and the
  *    cent-floor aggregates match the oracle's replay bit-for-bit).
  *
  * The measured operator is [[Ingest.readOrdersCsv]] — declared schema
  * (never inference: at 100 TB an inference pass is a full extra read),
  * nullValue="" cleaning, rename, dual-format parse — feeding one
  * 3-group rollup whose every column is sensitive to one hazard. The
  * fixture lines are built by whole-column expressions and written
  * line-splittable (header prepended per partition, no driver loop), so
  * the staging itself is shaped like a distributed extract job, and the
  * certificate read scans N files in N tasks with zero shuffle before
  * the final 3-group aggregate.
  *
  * What the oracle cannot see — that the staged bytes really carry the
  * hazards (a degenerate generator would replay green) — IngestCertSpec
  * pins against the raw staged text: header per file, both timestamp
  * shapes, unquoted-empty and quoted-comma fields, duplicated lines.
  */
object IngestQueries {

  private[graft] val Header =
    "orderId,productId,currency,quantity,shippingCost,amount," +
      "channel,channelGroup,campaign,dateTime"

  /** The hazard row source: orders columns under fixture names, with the
    * verbatim-duplicate rows (keys ≡ 0 mod 11) already unioned in.
    * Shared by q159's fixture, q161's two batch slices, and
    * IngestCertSpec, so fixture and assertions cannot drift.
    */
  private[graft] def hazardSource(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"), col("o_custkey"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority"), col("o_orderstatus"))
    src.unionAll(src.filter(col("k") % 11 === 0))
  }

  /** The hazard-laden CSV line set over a prepared [[hazardSource]]
    * frame. Header NOT included.
    */
  private[graft] def linesFrom(dup: DataFrame): DataFrame = {
    val ts = expr(
      "o_orderdate + make_interval(0, 0, 0, 0, 0, cast(k % 1440 as int), " +
        "cast(case when k % 2 = 0 then k % 60 else 0 end as int))")
    dup.select(concat(
      col("k").cast("string"), lit(","),
      col("o_custkey").cast("string"), lit(","),
      when(col("k") % 3 === 0, "EUR").otherwise("USD"), lit(","),
      (col("k") % 50 + 1).cast("int").cast("string"), lit(","),
      ((col("k") % 2000).cast("double") / 100.0).cast("string"), lit(","),
      col("o_totalprice").cast("string"), lit(","),
      col("o_orderpriority"), lit(","),
      col("o_orderstatus"), lit(","),
      // quoted-delimiter hazard on the live branch, unquoted-empty on
      // the null branch — both exact bytes, no writer mediation
      when(col("k") % 5 === 0, lit(""))
        .otherwise(concat(lit("\"camp,"), (col("k") % 7).cast("string"), lit("\""))),
      lit(","),
      when(col("k") % 2 === 0, date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .otherwise(date_format(ts, "yyyy-MM-dd'T'HH:mm'Z'"))).as("value"))
  }

  /** Shared oracle CTE fragment: the cleaned-column derivations from a
    * `k`/`o_orderdate` source — one definition interpolated into BOTH
    * the q159 and q161 oracle strings, so the hazard arithmetic (which
    * must mirror [[linesFrom]] exactly) cannot drift between the two
    * judged replays. A def, not a val: oracle strings are vals built at
    * object init and must never read a forward val reference.
    */
  private def hazardColsSql: String =
    """CASE WHEN k % 5 = 0 THEN NULL
      |         ELSE 'camp,' || cast(k % 7 AS varchar) END AS campaign,
      |    cast(k % 50 + 1 AS integer) AS quantity,
      |    (k % 2000) / 100.0 AS shipping_cost,
      |    o_orderdate + (k % 1440) * INTERVAL 1 minute
      |      + (CASE WHEN k % 2 = 0 THEN k % 60 ELSE 0 END) * INTERVAL 1 second
      |      AS date_time""".stripMargin

  /** Stage the fixture as a 4-file landing dir, each file carrying its
    * own camelCase header line (the CSV reader skips one header line per
    * file — a multi-file landing dir is the production shape).
    * `transform` reshapes the hazard source before line building (q161's
    * batch slices); the default identity keeps q159's fixture
    * byte-identical to its oracle's replay.
    */
  private[graft] def stageOrdersCsv(
      spark: SparkSession, dir: String, out: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    import spark.implicits._
    linesFrom(transform(hazardSource(spark, dir))).repartition(4).as[String]
      .mapPartitions(it => Iterator(Header) ++ it)
      .write.mode("overwrite").text(out)
  }

  val q159CsvIngestCert: QuerySpec = QuerySpec(
    (s, dir) => {
      val staged = graft.core.Staging.invocationDir("graft_q159_csv", dir)
      stageOrdersCsv(s, dir, staged)
      val ing = Ingest.readOrdersCsv(s, staged)
      ing.groupBy(col("channel_group"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(when(col("campaign").isNull, 1)).as("null_campaigns"),
          sum(length(col("campaign"))).cast("long").as("campaign_chars"),
          count(when(col("currency") === "EUR", 1)).as("n_eur"),
          sum(col("quantity")).as("qty_sum"),
          sum(floor(col("shipping_cost") * 100).cast("long")).as("ship_cents"),
          sum(floor(col("amount") * 100).cast("long")).as("amount_cents"),
          sum(unix_timestamp(col("date_time"))).as("ts_epoch_sum"),
          count(when(col("date_time").isNull, 1)).as("n_ts_null"))
        .orderBy(col("channel_group"))
    },
    s"""WITH src AS (
       |  SELECT o_orderkey AS k, o_custkey, o_totalprice, o_orderdate,
       |         o_orderpriority, o_orderstatus
       |  FROM orders),
       |dup AS (SELECT * FROM src UNION ALL SELECT * FROM src WHERE k % 11 = 0),
       |ing AS (
       |  SELECT o_orderstatus AS channel_group,
       |    CASE WHEN k % 3 = 0 THEN 'EUR' ELSE 'USD' END AS currency,
       |    o_totalprice AS amount,
       |    $hazardColsSql
       |  FROM dup)
       |SELECT channel_group,
       |  cast(count(*) AS bigint) AS n_rows,
       |  cast(count(*) FILTER (campaign IS NULL) AS bigint) AS null_campaigns,
       |  cast(sum(length(campaign)) AS bigint) AS campaign_chars,
       |  cast(count(*) FILTER (currency = 'EUR') AS bigint) AS n_eur,
       |  cast(sum(quantity) AS bigint) AS qty_sum,
       |  cast(sum(cast(floor(shipping_cost * 100) AS bigint)) AS bigint) AS ship_cents,
       |  cast(sum(cast(floor(amount * 100) AS bigint)) AS bigint) AS amount_cents,
       |  cast(sum(cast(epoch(date_time) AS bigint)) AS bigint) AS ts_epoch_sum,
       |  cast(count(*) FILTER (date_time IS NULL) AS bigint) AS n_ts_null
       |FROM ing GROUP BY channel_group ORDER BY channel_group""".stripMargin)

  /** q161: the reference main-flow certificate — `main.py`'s complete
    * user story composed through the REAL components and judged as one
    * row set: schema sync BEFORE ingest (R4 sequencing,
    * `main.py:20–24`), CSV landing dirs through the hazard-bearing
    * reader (S1/P1–P5), a first load whose within-batch duplicate keys
    * are APPENDED (§2.4 first-load semantics,
    * `flows/data_ingestion.py:116,146`), a re-run batch whose matched
    * keys overwrite only the latest state row (LWW,
    * `:50–65` + `:197–206`) while unseen keys append — both through
    * [[graft.state.StateTable.upsert]] on the reference's COMPOSITE
    * (order_id, product_id) key — and a final report rollup off the
    * store (S8 shape). Individually these operators are judged by
    * q159/q10/q11/q156-q160; what no other query certifies is the
    * COMPOSITION: the cleaned CSV values survive the store round-trip,
    * the duplicate-key multiplicity survives BOTH upserts, and the LWW
    * overwrite lands on exactly one copy of a duplicated key (the
    * oracle's weighted-arms replay: matched keys contribute copies−1
    * v1-rows plus one v2-row). The sync leg judges `CreateTable` — the
    * one SchemaSync branch q160 leaves spec-only (the applied change is
    * require-pinned, so a drift is a named failure).
    *
    * Determinism note: the duplicate lines are byte-identical, so
    * last-write-wins over a multi-file (nondeterministically ordered)
    * scan is value-deterministic — the same property the reference
    * relies on when pandas iterates its CSV in file order.
    *
    * Scale: two scan-parallel landing-dir reads, two key-window upsert
    * passes (the store's own algebra), one store-scan rollup — each leg
    * already individually plan-audited; the composition adds no new
    * shuffle class. The judged plan is the final store scan + 3-group
    * rollup + 3-row sort.
    */
  /** q161's batch slices over [[hazardSource]] — shared with
    * IngestCertSpec's lifecycle guard so the guarded flow can never
    * drift from the judged one (the hazardSource discipline).
    */
  private[graft] val q161Batch1: DataFrame => DataFrame =
    _.filter(col("k") % 3 =!= 0)
  private[graft] val q161Batch2: DataFrame => DataFrame =
    df => df.filter(col("k") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))

  /** Stage both flow batches to invocation dirs under `prefix` —
    * shared by the batch and streamed flows so the two legs always
    * ingest identically-derived landing dirs.
    */
  private def stageFlowBatches(s: SparkSession, dir: String,
      prefix: String): (String, String) = {
    val dirA = graft.core.Staging.invocationDir(s"${prefix}_b1", dir)
    val dirB = graft.core.Staging.invocationDir(s"${prefix}_b2", dir)
    stageOrdersCsv(s, dir, dirA, q161Batch1)
    stageOrdersCsv(s, dir, dirB, q161Batch2)
    (dirA, dirB)
  }

  /** Fresh store synced to the declared orders schema BEFORE any ingest
    * (R4 sequencing; the CreateTable branch is require-pinned). ONE
    * definition for both flow legs — the sync-before-ingest
    * precondition must be the same certificate in q161 and q162, not
    * two copies that can drift.
    */
  private def freshSyncedStore(s: SparkSession, dir: String,
      prefix: String, label: String): graft.state.StateTable = {
    val st = new graft.state.StateTable(s,
      graft.core.Staging.invocationDir(prefix, dir),
      graft.core.Schemas.ordersKey)
    val changes = graft.schemasync.SchemaSync.sync(s, st, graft.core.Schemas.orders)
    require(changes == Seq(
      graft.schemasync.SchemaSync.CreateTable(graft.core.Schemas.orders)),
      s"$label precondition: fresh-store sync applied $changes instead of CreateTable")
    st
  }

  /** Stage both landing dirs and run the full flow (sync → first load →
    * re-run) through a fresh store; returns the store with its three
    * retained versions (empty CreateTable, first load, re-run). Shared
    * by the judged query and the lifecycle guard.
    */
  private[graft] def q161BuildStore(s: SparkSession, dir: String): graft.state.StateTable = {
    val (dirA, dirB) = stageFlowBatches(s, dir, "graft_q161")
    val st = freshSyncedStore(s, dir, "graft_q161_state", "q161")
    st.upsert(Ingest.readOrdersCsv(s, dirA)) // first load: append, dups kept
    st.upsert(Ingest.readOrdersCsv(s, dirB)) // re-run: LWW + unseen appends
    st
  }

  /** The flow's report rollup over a store's cleaned contents — shared
    * by q161 (batch store) and q162 (streamed store), so the two judged
    * certificates aggregate identically by construction.
    */
  private def flowRollup(contents: DataFrame): DataFrame =
    contents.groupBy(col("channel_group"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("campaign").isNull, 1)).as("null_campaigns"),
        sum(length(col("campaign"))).cast("long").as("campaign_chars"),
        sum(col("quantity")).as("qty_sum"),
        sum(floor(col("shipping_cost") * 100).cast("long")).as("ship_cents"),
        sum(floor(col("amount") * 100).cast("long")).as("amount_cents"),
        sum(unix_timestamp(col("date_time"))).as("ts_epoch_sum"))

  /** The flow oracle: weighted-arms LWW replay shared verbatim by q161
    * and q162 (whose streamed store must equal the batch one, so the
    * same replay predicts both); `extraCols` appends the per-query
    * contract columns. A def for the object-init ordering rule.
    */
  private def flowOracleSql(extraCols: String): String =
    s"""WITH src AS (
       |  SELECT o_orderkey AS k, o_custkey, o_totalprice, o_orderdate,
       |         o_orderpriority, o_orderstatus FROM orders),
       |keyed AS (
       |  SELECT *, CASE WHEN k % 11 = 0 THEN 2 ELSE 1 END AS copies,
       |    $hazardColsSql
       |  FROM src),
       |-- weighted-arms LWW replay: batch-1 rows keep all copies on
       |-- unmatched keys and copies-1 on matched keys (the overwrite
       |-- absorbs exactly one), matched keys add one v2-amount row,
       |-- unseen batch-2 keys append all copies
       |arm_old AS (
       |  SELECT o_orderstatus, campaign, quantity, shipping_cost, date_time,
       |         o_totalprice AS amount,
       |         copies - (CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS w
       |  FROM keyed WHERE k % 3 <> 0),
       |arm_upd AS (
       |  SELECT o_orderstatus, campaign, quantity, shipping_cost, date_time,
       |         o_totalprice * cast(1.1 AS double) AS amount, 1 AS w
       |  FROM keyed WHERE k % 3 <> 0 AND k % 2 = 0),
       |arm_ins AS (
       |  SELECT o_orderstatus, campaign, quantity, shipping_cost, date_time,
       |         o_totalprice * cast(1.1 AS double) AS amount, copies AS w
       |  FROM keyed WHERE k % 3 = 0 AND k % 2 = 0),
       |fin AS (SELECT * FROM arm_old WHERE w > 0
       |        UNION ALL SELECT * FROM arm_upd
       |        UNION ALL SELECT * FROM arm_ins)
       |SELECT o_orderstatus AS channel_group,
       |  cast(sum(w) AS bigint) AS n_rows,
       |  cast(sum(CASE WHEN campaign IS NULL THEN w ELSE 0 END) AS bigint) AS null_campaigns,
       |  cast(sum(CASE WHEN campaign IS NULL THEN 0
       |                ELSE w * length(campaign) END) AS bigint) AS campaign_chars,
       |  cast(sum(w * quantity) AS bigint) AS qty_sum,
       |  cast(sum(w * cast(floor(shipping_cost * 100) AS bigint)) AS bigint) AS ship_cents,
       |  cast(sum(w * cast(floor(amount * 100) AS bigint)) AS bigint) AS amount_cents,
       |  cast(sum(w * cast(epoch(date_time) AS bigint)) AS bigint) AS ts_epoch_sum,
       |  $extraCols
       |FROM fin GROUP BY channel_group ORDER BY channel_group""".stripMargin

  val q161ReferenceFlowE2e: QuerySpec = QuerySpec(
    (s, dir) => {
      val st = q161BuildStore(s, dir)
      val versions = st.history().size.toLong
      flowRollup(st.current().get)
        .withColumn("n_versions", lit(versions))
        .orderBy(col("channel_group"))
    },
    flowOracleSql("cast(3 AS bigint) AS n_versions"))

  /** The streamed flow's handles: the store plus a re-drain thunk over
    * the same landing dir + checkpoint, so IngestCertSpec can prove the
    * exactly-once file log covers every landed file (a third drain with
    * nothing new must not write a version).
    */
  private[graft] final case class StreamedFlow(
      st: graft.state.StateTable, drain: () => Unit)

  private[graft] def q162BuildStreamedStore(s: SparkSession, dir: String): StreamedFlow = {
    // the phase-1 files stage directly into the landing dir; phase-2
    // files stage aside and land between the drains
    val (landing, stageB) = stageFlowBatches(s, dir, "graft_q162")
    val st = freshSyncedStore(s, dir, "graft_q162_state", "q162")
    val ckpt = graft.core.Staging.invocationDir("graft_q162_ckpt", dir)
    def drain(): Unit =
      graft.streaming.StreamingIngest.runOrdersIngest(s, landing, st, ckpt)
        .awaitTermination()
    drain() // phase 1: the first-load files
    // phase 2: the re-run files land in the SAME directory (fresh names;
    // the file source keys its processed-log on path)
    graft.core.Fs.listDir(java.nio.file.Paths.get(stageB))
      .filter(_.getFileName.toString.startsWith("part-"))
      .zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(landing, s"rerun-$i-${p.getFileName}")): Unit
      }
    drain() // phase 2: only the newly-landed files
    require(st.history().size == 3,
      s"q162 precondition: expected CreateTable + 2 micro-batch versions, " +
        s"got ${st.history().size} — trigger chunking or the checkpoint " +
        "file log drifted")
    StreamedFlow(st, () => drain())
  }

  /** q162: the STREAMING twin of q161 — the reference's "re-run when a
    * new file lands" semantics (`main.py:29–32`) as a file-source
    * stream, judged equal to the shared batch flow. Two `AvailableNow`
    * drains over ONE landing directory under ONE checkpoint: phase 1
    * drains the first-load files; the re-run files then LAND in the
    * same directory and phase 2 drains them — the checkpoint's
    * file-source log must skip every already-processed file, so the
    * judged `equiv_diff = 0` against [[q161BuildStore]]'s contents is
    * also an exactly-once certificate (a reprocessed first-load file
    * would LWW matched keys back to their v1 amounts and break the
    * multiset diff across ~half the key space). Each drain's upsert
    * goes through `foreachBatch` into the SAME `StateTable.upsert` the
    * batch flow calls — batch–stream parity by construction, judged
    * rather than assumed (the q117/q157 convention applied to the
    * reference's own flow).
    *
    * Determinism: a drain with no `maxFilesPerTrigger` bound processes
    * all available files in ONE micro-batch, so the store sees exactly
    * two upserts; the `history == 3` require names that assumption
    * (CreateTable + 2 micro-batches) instead of letting a trigger-
    * chunking change surface as an oracle mismatch. Within a
    * micro-batch the duplicate lines are byte-identical, so LWW is
    * value-deterministic under any file order (q161's argument).
    *
    * Scale: the file source tracks processed files in the checkpoint
    * (exactly-once per file at any corpus size); each micro-batch is an
    * ordinary distributed upsert. The judged plan is the streamed
    * store's scan-rollup plus the full-row multiset diff against the
    * batch store — two store scans, the honest price of an equivalence
    * certificate (q141/q151/q157 convention).
    */
  val q162StreamingFlowE2e: QuerySpec = QuerySpec(
    (s, dir) => {
      val streamed = q162BuildStreamedStore(s, dir).st
      val batch = q161BuildStore(s, dir)
      val a = streamed.current().get
      val b = batch.current().get
      val versions = streamed.history().size.toLong
      // per-group full-row multiset symmetric difference (q156's
      // convention): every column participates, so any value the CSV →
      // clean → upsert chain produced differently in either leg breaks
      // it. Computed as ±1-weighted union-groupBy, NOT a count join —
      // campaign is legitimately NULL on cleaned rows, and a join on
      // the column list can never match NULL keys (NULL = NULL is not
      // true), which would report every null-campaign row as a
      // spurious two-sided diff; grouping treats NULLs as equal. One
      // shuffle instead of two-plus-join, too.
      val cols = a.columns.toIndexedSeq
      val diff = a.withColumn("_w", lit(1L)).unionByName(b.withColumn("_w", lit(-1L)))
        .groupBy(cols.map(col): _*).agg(sum(col("_w")).as("_imb"))
        .groupBy(col("channel_group"))
        .agg(sum(abs(col("_imb"))).as("equiv_diff"))
      // inner join: diff is grouped from the UNION of both stores, so
      // its channel_group set is a superset of the rollup's by
      // construction — there is no unmatched-row case to coalesce (and
      // a group present in only one store still surfaces, as a nonzero
      // equiv_diff on the side that has it or a missing rollup row
      // against the oracle's shape)
      flowRollup(a)
        .withColumn("n_versions", lit(versions))
        .join(diff, Seq("channel_group"))
        .orderBy(col("channel_group"))
    },
    flowOracleSql(
      "cast(3 AS bigint) AS n_versions,\n  cast(0 AS bigint) AS equiv_diff"))

  val all: Map[String, QuerySpec] = Map(
    "q159_csv_ingest_cert" -> q159CsvIngestCert,
    "q161_reference_flow_e2e" -> q161ReferenceFlowE2e,
    "q162_streaming_flow_e2e" -> q162StreamingFlowE2e)
}
