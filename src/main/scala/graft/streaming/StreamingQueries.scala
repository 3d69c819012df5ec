package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.tables.Tables

/** Judged queries whose results are PRODUCED BY the streaming path —
  * the events table is replayed as micro-batches through a Structured
  * Streaming job inside the query, and the returned DataFrame reads the
  * job's sink. The DuckDB oracle is the plain batch SQL: the gate
  * therefore proves streamed ≡ batch on real data, not just in specs.
  *
  * Only ORDER-INDEPENDENT (semilattice-merge) state machines may be
  * judged this way: the file source guarantees order only within a
  * micro-batch, so a judged result must be invariant to batch boundaries
  * and file scheduling. Order-sensitive machines (the sequential q50
  * funnel) stay batch-parity-only — see StreamingFunnelSpec — but the
  * funnel's FIRST-TOUCH refinement is a semilattice and is judged with
  * an event-time watermark as q154 ([[StreamingWatermarkFunnel]]).
  */
/** One lock for EVERY streaming replay harness in the process
  * ([[StreamingQueries.replayToSink]], [[StreamingWatermarkFunnel
  * .replayTwoPhase]]): each harness resizes the session-global
  * `spark.sql.shuffle.partitions` for its streaming job and restores
  * it after, so two replays synchronized on their OWN objects could
  * still interleave set/restore and leave the session with a replay-
  * sized conf (or run one replay's state at the other's sizing).
  */
private[streaming] object ReplayLock

object StreamingQueries {

  private val TopN = 5
  private val ReplayFiles = 8

  /** q154's lateness horizon: 21 days against the 30-day event span, so
    * the admitted slice dominates (~70%) while the late slice stays a
    * measurable completeness cost. Declared up top because the oracle
    * val below interpolates it at object init (forward val references
    * silently read 0).
    */
  private val WatermarkDelayDays = 21

  /** q155's delay lattice. Contains [[WatermarkDelayDays]] so the
    * curve's 21-day row is exactly q154's operating point
    * (spec-pinned equal to the streamed certificate — the q144 ≡ q140
    * convention).
    */
  private val CalibrationDelaysDays = Seq(3, 7, 14, WatermarkDelayDays, 28)

  /** Stage `batch` as [[ReplayFiles]] parquet files — ONCE per (query,
    * scale, process) under [[graft.core.Staging.sharedDir]]'s
    * memoized-stage contract — then run the streaming transform
    * `build` returns over them (one file per trigger = a real
    * micro-batch replay) into a uniquely-named memory sink, process to
    * convergence, and return the sink's contents. `build` maps the
    * replay stream to (transformed stream, output mode); the sink
    * plumbing lives here so every judged streaming query shares one
    * harness.
    *
    * Harness-cost discipline (the replay is test scaffolding, not the
    * operator, so its cost must not dominate the measurement):
    *  - staged input is reused across runs in one process (the first
    *    bench run pays the stage, the timed min measures the operator);
    *  - `Trigger.AvailableNow` processes the staged files and stops —
    *    no idle trigger polling — while still honoring
    *    `maxFilesPerTrigger=1`, so the replay stays a genuine
    *    multi-micro-batch execution;
    *  - shuffle/state partitions are [[ReplayFiles]] for the streaming
    *    job only (restored after): a replayed micro-batch carries
    *    ~1/[[ReplayFiles]] of a test corpus, and 32 state-store
    *    instances × 8 micro-batches of commit overhead would be pure
    *    harness tax. Production sizes state partitions to the cluster;
    *    results are partitioning-independent (each judged machine is an
    *    order/boundary-independent semilattice — see the query docs).
    *
    * The sink view and the job are torn down in all cases; the staged
    * dir persists for the process (shared-stage contract). The returned
    * DataFrame stays valid because `s.table` resolves the memory
    * relation eagerly.
    */
  private def replayToSink(s: SparkSession, batch: DataFrame, tag: String, dir: String)(
      build: DataFrame => (DataFrame, String)): DataFrame = ReplayLock.synchronized {
    // The whole replay holds the monitor, not just the staging: the
    // state-partition sizing below mutates the SESSION-GLOBAL
    // spark.sql.shuffle.partitions and restores it after, and two
    // concurrent replays in one session would otherwise race on that
    // conf (one restoring 32 while the other starts at 8) — making
    // plans and state sizing nondeterministic even though results are
    // partitioning-independent. Serializing replays is the cost-free
    // fix here: the sequential driver mains never contend, and batch
    // queries (which don't touch the conf) are unaffected.
    val replayDir = graft.core.Staging.sharedDir(s"graft_replay_$tag", dir)
    locally {
      val marker = java.nio.file.Paths.get(replayDir, "_STAGED")
      if (!Files.exists(marker)) {
        // overwrite clears any partial previous attempt (no marker ⇒
        // unfinished); the marker lands only after a complete write
        batch.repartition(ReplayFiles).write.mode("overwrite").parquet(replayDir)
        Files.createFile(marker): Unit
      }
    }
    // unique sink name: the query may run more than once per session
    val sink = tag + "_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    var job: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    val partsConf = "spark.sql.shuffle.partitions"
    val prevParts = s.conf.get(partsConf)
    try {
      s.conf.set(partsConf, ReplayFiles.toString)
      val stream = s.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replayDir)
      val (out, mode) = build(stream)
      job = Some(out.writeStream.format("memory").queryName(sink)
        .outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      job.foreach(_.awaitTermination())
      s.table(sink)
    } finally {
      // stop FIRST (also on the failure path — a live query must not
      // outlive its harness); each cleanup step swallows its own
      // failure so one failing step neither masks the try block's real
      // exception nor skips the remaining teardown — but logs it, so a
      // leaked sink/job is observable, not silent
      def swallow(what: String)(step: => Unit): Unit =
        try step catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] $tag replay teardown: '$what' failed (possible leak): $e")
        }
      swallow("stop streaming job")(job.foreach(_.stop()))
      swallow("restore shuffle partitions")(s.conf.set(partsConf, prevParts))
      swallow(s"drop memory sink view $sink")(s.catalog.dropTempView(sink))
    }
  }

  // The judged q137/q153 flag consumer is
  // [[StreamingHammingDup.exactFlags]] — streamed deltas for live
  // buckets + the re-seed leg for tombstoned ones — shared with
  // StreamingNearDupSpec's certificates so the gate and the spec
  // cannot drift.

  /** Per-event-type top-5 events by value, computed by replaying events
    * as micro-batches through [[StreamingTopK]] (`mapGroupsWithState`,
    * k-bounded state per key).
    *
    * Replay order independence: bounded top-k is a semilattice merge —
    * max-k(union) is the same whatever the batch boundaries or their
    * order. Update mode re-emits a key's top list every batch that
    * touches it; each key's LAST emission (the converged state) is
    * selected by the per-key batch counter the state function itself
    * emits (`seq`) — no reliance on sink scan order or id monotonicity.
    */
  val q66StreamingTopK: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      val batch = Tables.events(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      replayToSink(s, batch, "q66", dir) { stream =>
        (StreamingTopK.topK(stream.as[StreamingTopK.Ev], k = TopN).toDF(), "update")
      }
        .groupBy(col("event_type"))
        .agg(max_by(col("top"), col("seq")).as("top"))
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), col("col.event_id").as("event_id"),
          col("col.value").as("value"), (col("pos") + 1).cast("integer").as("rank"))
        .orderBy(col("event_type"), col("rank"))
    },
    s"""SELECT event_type, event_id, value, rank
       |FROM (SELECT event_type, event_id, value,
       |        cast(row_number() OVER (PARTITION BY event_type
       |               ORDER BY value DESC, event_id) AS integer) AS rank
       |      FROM events)
       |WHERE rank <= $TopN ORDER BY event_type, rank""".stripMargin)

  /** Retention cohorts (q51's report) computed BY the streaming path:
    * events replayed as micro-batches through [[StreamingRetention]]
    * (per-user bounded state: cohort day + distinct activity days within
    * the horizon), converged per-user states selected by `max_by(seq)`,
    * then a batch rollup to (cohort_date, day_offset, n_active). The
    * oracle is q51's batch SQL verbatim — streamed cohorts must equal
    * the batch cohorts exactly.
    *
    * Order independence: per-user state is (min cohort, day-set union +
    * prune) — a semilattice merge (see [[StreamingRetention]] for why
    * pruning commutes with late data).
    */
  val q68StreamingRetention: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      val epoch = to_date(lit("1970-01-01"))
      val batch = Tables.events(s, dir)
        .select(col("user_id"), datediff(to_date(col("ts")), epoch).as("day"))
      replayToSink(s, batch, "q68", dir) { stream =>
        (StreamingRetention.retention(stream.as[StreamingRetention.Ev]).toDF(), "update")
      }
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("cohort"), col("days")), col("seq")).as("m"))
        .select(col("user_id"), col("m.cohort").as("cohort"),
          explode(col("m.days")).as("act_day"))
        .groupBy(
          date_add(epoch, col("cohort")).cast("timestamp").as("cohort_date"),
          (col("act_day") - col("cohort")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_date"), col("day_offset"))
    },
    // identical to q51's oracle: the computation route changed (stateful
    // streaming replay), the semantics didn't
    """WITH f AS (SELECT user_id, min(cast(ts AS date)) AS cohort_date
      |           FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, cast(ts AS date) AS act_date FROM events)
      |SELECT cast(cohort_date AS timestamp) AS cohort_date,
      |       cast(date_diff('day', cohort_date, act_date) AS integer) AS day_offset,
      |       count(DISTINCT a.user_id) AS n_active
      |FROM a JOIN f ON a.user_id = f.user_id
      |WHERE date_diff('day', cohort_date, act_date) <= 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** Hourly tumbling-window counts/sums (q23's report) computed by
    * Spark's NATIVE stateful streaming aggregation — the third
    * streaming-judged route, exercising the built-in incremental-agg
    * operator rather than `mapGroupsWithState`. Complete output mode
    * truncates and rewrites the memory sink every micro-batch, so after
    * convergence the sink IS the converged result — no last-emission
    * selection at all. State is additive (count + EXACT decimal sum), so
    * the result is batch-boundary- and order-independent; a float sum
    * here would drift with the replay's accumulation order and fail the
    * oracle hash intermittently.
    */
  val q70StreamingWindows: QuerySpec = QuerySpec(
    (s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val batch = Tables.events(s, dir)
        .select(col("ts"), col("event_type"), col("value"))
      replayToSink(s, batch, "q70", dir) { stream =>
        (stream
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("total_value")),
          "complete")
      }
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    // identical to q23's oracle: same semantics, streaming-computed
    """SELECT date_trunc('hour', ts) AS window_start,
      |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
      |       event_type, count(*) AS n_events,
      |       cast(sum(cast(value AS decimal(12,2))) AS double) AS total_value
      |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin)

  /** Per-source unique-document counts where the DEDUP ITSELF runs on
    * the streaming path: documents are replayed as micro-batches through
    * `dropDuplicates(source, fp)` — Spark's stateful streaming
    * deduplication, one state row per distinct key — and the append-mode
    * sink receives each first-seen (source, fingerprint) exactly once.
    * The batch side merely counts the sink. The fingerprint is q16's
    * normalization (one definition, `TextOps.normCol`, so the schemes
    * cannot drift).
    *
    * Order independence: which PHYSICAL row survives dedup depends on
    * replay order, but the judged result only depends on the distinct
    * (source, fp) SET — a union semilattice. (Keying dedup by source AND
    * fp matters: global fp dedup would attribute a fingerprint shared
    * across sources to whichever arrived first.) Production pairs this
    * with `dropDuplicatesWithinWatermark` for bounded state — covered
    * by the streaming-dedup spec; the judged replay is finite.
    */
  val q77StreamingDedup: QuerySpec = QuerySpec(
    (s, dir) => {
      val batch = Tables.documents(s, dir)
        .select(col("source"), md5(graft.ext.TextOps.normCol).as("fp"))
        // NULL-text docs have fp = NULL; the oracle's count(DISTINCT)
        // ignores NULLs, but dropDuplicates treats NULL as a key value
        // and would emit (source, NULL) once — drop them for parity
        .filter(col("fp").isNotNull)
      replayToSink(s, batch, "q77", dir) { stream =>
        (stream.dropDuplicates("source", "fp"), "append")
      }
        .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
        .orderBy(col("source"))
    },
    s"""SELECT source, count(DISTINCT md5(${graft.ext.TextOps.normSql})) AS n_unique
       |FROM documents GROUP BY source ORDER BY source""".stripMargin)

  /** View→purchase attribution computed by a STREAM-STREAM interval
    * join — the last major Structured Streaming surface: two streams
    * (views and purchases, filtered off the same replayed source)
    * joined on user_id with `purchase.ts ∈ [view.ts, view.ts + 1h]`,
    * append-mode sink receiving each matched pair exactly once, batch
    * rollup to per-user pair counts + fastest conversion.
    *
    * Order independence: a stream-stream INNER join emits a pair when
    * its second half arrives, whatever the batch boundaries — the
    * match SET is symmetric in arrival order, and nothing here is ever
    * late enough to be dropped: the watermark delay (90 days) exceeds
    * the corpus's whole time span, so state outlives the replay and the
    * joined set is exactly the batch join. That is the judged-exactness
    * trade at test scale; production replaces the delay with the real
    * out-of-orderness bound (e.g. '2 hours'), which caps join state at
    * (delay + interval) of per-key history — the 100 TB story, where
    * unbounded buffering of either stream would be fatal. The interval
    * condition itself is what lets Spark evict: state for a view dies
    * once the watermark passes view.ts + 1h.
    */
  val q84StreamStreamJoin: QuerySpec = QuerySpec(
    (s, dir) => {
      val batch = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      replayToSink(s, batch, "q84", dir) { stream =>
        val views = stream.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("v_ts"))
          .withWatermark("v_ts", "90 days")
        val purchases = stream.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
          .withWatermark("p_ts", "90 days")
        (views.join(purchases,
            col("v_user") === col("p_user")
              && col("p_ts") >= col("v_ts")
              && col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us")),
          "append")
      }
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"), min(col("lag_us")).as("min_lag_us"))
        .orderBy(col("user_id"))
    },
    """WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id, count(*) AS n_pairs,
      |       cast(min(epoch_us(p.ts) - epoch_us(v.ts)) AS bigint) AS min_lag_us
      |FROM v JOIN p ON v.user_id = p.user_id
      |              AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin)

  /** q99: STREAMING near-duplicate detection — documents' MinHash LSH
    * band rows replayed as micro-batches through [[StreamingNearDup]]
    * (O(1) min-doc_id state per bucket), flagged docs rolled up per
    * source against the full corpus. The oracle is the BATCH LSH
    * candidate chain (q18's CTEs): streaming must flag exactly the
    * docs that share a band bucket with a smaller doc_id.
    *
    * Order independence: the final flagged set is "bucket members
    * except the bucket's global min", which [[StreamingNearDup]]'s
    * supersession protocol reaches under any arrival order or batch
    * boundaries — the state is a meet-semilattice (running min) and
    * every non-min member is emitted exactly when first dominated.
    */
  val q99StreamingNearDup: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val bandBatch = graft.ext.TextOps.minhashBands(docs)
        .select(col("doc_id"), col("band_id").cast("integer").as("band_id"),
          col("bucket"))
      val flaggedDf = replayToSink(s, bandBatch, "q99", dir) { stream =>
        (StreamingNearDup.flagged(stream.as[StreamingNearDup.BandRow]).toDF(), "append")
      }
      docs.join(
          flaggedDf.select(col("doc_id")).distinct().withColumn("f", lit(1L)),
          Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), count(col("f")).as("n_neardup"))
        .orderBy(col("source"))
    },
    graft.ext.TextOps.lshChainSql +
      """
        |, flagged AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
        |SELECT d.source AS source, cast(count(*) AS bigint) AS n_docs,
        |       cast(count(f.doc_id) AS bigint) AS n_neardup
        |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin)

  /** q137: STREAMING image perceptual near-dup — q133's dHash banding
    * run through `flatMapGroupsWithState` ([[StreamingHammingDup]]):
    * band rows from the REAL codec-path signature frame are replayed as
    * micro-batches, per-bucket bounded state applies the exact Hamming
    * predicate with the batch scheme's cap, and the judged rollup is
    * the per-source flagged accounting. Flags arrive attributed to
    * their (band, v) bucket; the rollup anti-joins them against the
    * saturation tombstones so an over-cap bucket contributes nothing —
    * the batch `HAVING count(*) <= cap` semantics, exactly. The oracle
    * replays q133's batch pairs (cap filter included) and takes
    * `DISTINCT media_id_b` — the set the order-independent emission
    * protocol converges to regardless of batch boundaries (the q99
    * contract, generalized from min-tracking to pair predicates).
    *
    * Scale: state per (band, v) bucket is ≤ cap (id, sig, bit)
    * entries — bounded exactly where the batch join is; everything
    * upstream of the stateful operator is the q133 codec/signature
    * plan.
    */
  val q137StreamingImageNearDup: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      val sigs = graft.ext.Multimodal.imageSigFrame(s, dir)
      val bandRows = graft.ext.Multimodal.dhashBandRows(sigs)
        .select(col("media_id"), col("sig"),
          col("band").cast("integer").as("band"), col("v"))
      val events = replayToSink(s, bandRows.withColumn("purge", lit(false)),
        "q137", dir) { stream =>
        (StreamingHammingDup.flagged(stream.as[StreamingHammingDup.SigBandRow],
          graft.ext.Multimodal.DHashBucketCap,
          graft.ext.Multimodal.DHashHamMax).toDF(), "append")
      }
      val flags = StreamingHammingDup.exactFlags(events, bandRows,
        graft.ext.Multimodal.DHashBucketCap, graft.ext.Multimodal.DHashHamMax)
      Tables.documents(s, dir)
        .join(flags.select(col("media_id").as("doc_id"))
          .withColumn("f", lit(1L)), Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_images"), count(col("f")).as("n_neardup"))
        .orderBy(col("source"))
    },
    "WITH " + graft.ext.Multimodal.imageSigCtes("") +
      graft.ext.Multimodal.dhashPairsSql("sig", "") +
      """
        |, flagged AS (SELECT DISTINCT media_id_b AS doc_id FROM pairs)
        |SELECT d.source AS source, cast(count(*) AS bigint) AS n_images,
        |       cast(count(f.doc_id) AS bigint) AS n_neardup
        |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin)

  /** q153: DELETION PROPAGATION INTO STREAMING STATE — the leg q136
    * couldn't reach: q136 purges the corpus, the inverted index and the
    * BATCH near-dup frames, but a stateful streaming near-dup operator
    * holds (band, bucket) member state that would still contain purged
    * ids after a restart-from-checkpoint. Here the purge list (the SAME
    * `doc_id % 83` deletion-request slice as q136) is fed INTO the
    * running [[StreamingHammingDup]] as control rows — routed to
    * exactly the buckets holding each purged id, because band values
    * derive from the id's own signature (no bucket directory needed) —
    * and the operator evicts the member and RETRACTS flags whose only
    * justification it was (−1 net deltas). The judged row per source
    * carries the full accounting (images, purged, pre/post flag
    * counts, retractions) plus the q141-style equivalence certificate:
    * `equiv_diff` is the symmetric difference between the STREAMED
    * post-purge flag set and the BATCH near-dup flags recomputed from
    * scratch on the purged corpus — judged 0, so the maintained
    * streaming state provably converges to the rebuild answer.
    * `n_neardup_post` itself is the streamed value hash-matched against
    * the oracle's batch replay — the equivalence is certified twice.
    *
    * Purge rows interleave with admits under the replay's arbitrary
    * file scheduling, so the run genuinely exercises the protocol's
    * purge/admit commutativity (a purged id is remembered as a dead
    * member; its later admit is a no-op). Saturated buckets are revived
    * from the live at-rest corpus by the re-seed leg
    * ([[StreamingHammingDup.exactFlags]] — the consumer is exact in ALL
    * cases, not just under headroom); none exist on this corpus
    * (spec-pinned headroom, so the leg runs empty here), and the
    * forced-saturation + purge-below-cap certificate lives in
    * StreamingNearDupSpec.
    *
    * Scale: the purge leg costs |purged| × bands control rows — shard-
    * incident work, never a state rebuild; per-bucket state stays ≤ cap
    * members (dead entries included); the certificate's from-scratch
    * batch leg is the one intentionally-full verification pass, exactly
    * q136's maintenance-vs-rebuild convention.
    */
  val q153StreamingNearDupPurge: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      def isDel(c: org.apache.spark.sql.Column) = c % 83 === 0
      val sigs = graft.ext.Multimodal.imageSigFrame(s, dir)
      def bandRows(f: DataFrame, purge: Boolean): DataFrame =
        graft.ext.Multimodal.dhashBandRows(f)
          .select(col("media_id"), col("sig"),
            col("band").cast("integer").as("band"), col("v"),
            lit(purge).as("purge"))
      val rows = bandRows(sigs, purge = false)
        .unionByName(bandRows(sigs.filter(isDel(col("media_id"))), purge = true))
      val events = replayToSink(s, rows, "q153", dir) { stream =>
        (StreamingHammingDup.flagged(stream.as[StreamingHammingDup.SigBandRow],
          graft.ext.Multimodal.DHashBucketCap,
          graft.ext.Multimodal.DHashHamMax).toDF(), "append")
      }
      val liveBand = bandRows(sigs.filter(!isDel(col("media_id"))), purge = false)
        .drop("purge")
      val streamed = StreamingHammingDup.exactFlags(events, liveBand,
        graft.ext.Multimodal.DHashBucketCap, graft.ext.Multimodal.DHashHamMax)
        .select(col("media_id").as("doc_id")).withColumn("st", lit(1L))
      val batchPost = graft.ext.Multimodal
        .hammingDupPairs(sigs.filter(!isDel(col("media_id"))))
        .select(col("media_id_b").as("doc_id")).distinct().withColumn("bp", lit(1L))
      val batchPre = graft.ext.Multimodal.hammingDupPairs(sigs)
        .select(col("media_id_b").as("doc_id")).distinct().withColumn("pr", lit(1L))
      Tables.documents(s, dir)
        .join(streamed, Seq("doc_id"), "left_outer")
        .join(batchPost, Seq("doc_id"), "left_outer")
        .join(batchPre, Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_images"),
          sum(when(isDel(col("doc_id")), 1L).otherwise(0L)).as("n_purged"),
          count(col("pr")).as("n_neardup_pre"),
          count(col("st")).as("n_neardup_post"),
          sum(when(col("pr").isNotNull && col("st").isNull && !isDel(col("doc_id")), 1L)
            .otherwise(0L)).as("n_retracted"),
          sum(when(coalesce(col("st"), lit(0L)) =!= coalesce(col("bp"), lit(0L)), 1L)
            .otherwise(0L)).as("equiv_diff"))
        .orderBy(col("source"))
    },
    "WITH " + graft.ext.Multimodal.imageSigCtes("") +
      graft.ext.Multimodal.dhashPairsSql("sig", "") +
      ",\npsig AS (SELECT * FROM sig WHERE doc_id % 83 <> 0)" +
      graft.ext.Multimodal.dhashPairsSql("psig", "p") +
      s"""
        |, fpre AS (SELECT DISTINCT media_id_b AS doc_id FROM pairs),
        |fpost AS (SELECT DISTINCT media_id_b AS doc_id FROM ppairs)
        |SELECT d.source AS source, cast(count(*) AS bigint) AS n_images,
        |  ${graft.ext.OracleSql.bigSum("CASE WHEN d.doc_id % 83 = 0 THEN 1 ELSE 0 END")} AS n_purged,
        |  cast(count(a.doc_id) AS bigint) AS n_neardup_pre,
        |  cast(count(b.doc_id) AS bigint) AS n_neardup_post,
        |  ${graft.ext.OracleSql.bigSum("CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NULL AND d.doc_id % 83 <> 0 THEN 1 ELSE 0 END")} AS n_retracted,
        |  cast(0 AS bigint) AS equiv_diff
        |FROM documents d LEFT JOIN fpre a ON d.doc_id = a.doc_id
        |LEFT JOIN fpost b ON d.doc_id = b.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin)

  /** q154: EVENT-TIME-WATERMARKED funnel — the last Structured
    * Streaming capability the replay-order contract kept out of the
    * gate (see this object's header: the order-sensitive q50 funnel
    * stays batch-parity-only). The FIRST-TOUCH funnel (stage ≥ 2 iff
    * min(click) > min(view), ≥ 3 iff additionally min(purchase) >
    * min(click)) is a semilattice over per-type min timestamps, so it
    * IS order-independent — and the watermark bounds late data
    * deterministically under [[StreamingWatermarkFunnel.replayTwoPhase]]'s
    * two-phase replay: the on-time slice (ts > cut, cut = ms-floored
    * max event time − [[WatermarkDelayDays]]) replays to completion,
    * then the job RESTARTS FROM CHECKPOINT (file sink, exactly-once)
    * over the late slice with the restored watermark pinned at cut, so
    * every late row is dropped regardless of file order. The admitted
    * set is therefore the SQL-expressible slice `ts > cut`, and the
    * judged row carries the completeness/latency trade: the streamed
    * reach counts (adm_*) against the full-corpus batch funnel
    * (full_*), the late/admitted event counts, and the q141-style
    * per-user certificate `equiv_diff` = streamed stages vs the batch
    * funnel recomputed on the admitted slice, judged 0.
    *
    * Scale: per-user state is three min-timestamps, and the
    * delay-keyed state TTL (armed inside the replay, provably inert
    * there — [[StreamingWatermarkFunnel.stages]]) bounds state by the
    * ACTIVE user set on an unbounded stream; the cut is one scalar
    * aggregate computed before staging (the q143 at-rest convention).
    * The scalar accounting
    * frames assemble via broadcast 1-row crossJoins (the q135
    * convention).
    */
  val q154WatermarkFunnel: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      val delayMs = WatermarkDelayDays * 86400000L
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("t", unix_micros(col("ts")))
      // the watermark boundary in Spark's own terms: max event time is
      // tracked ms-floored, so cut = (floor(max_us/1000) − delay_ms)·1000
      val maxMicros = ev.agg(max(col("t"))).as[Long].head()
      val cutMicros = StreamingWatermarkFunnel.cutMicros(maxMicros, delayMs)
      val onTime = ev.filter(col("t") > cutMicros)
      val late = ev.filter(col("t") <= cutMicros)
      val sink = StreamingWatermarkFunnel.replayTwoPhase(s,
        onTime.select(col("user_id"), col("ts"), col("event_type")),
        late.select(col("user_id"), col("ts"), col("event_type")),
        "q154", dir, delayMs)
      // (mark, seq) is the convergence key — strictly increasing over a
      // user's whole emission history INCLUDING TTL evictions/revivals
      // (StreamingWatermarkFunnel.StageRow doc); seq alone collides
      // across lifetimes
      val streamed = sink.groupBy(col("user_id"))
        .agg(max_by(col("stage"), struct(col("mark"), col("seq"))).as("stage"))
      // the same first-touch chain in batch, for the certificate and
      // the completeness margin — min-per-type then the stage rule
      def firstTouch(df: DataFrame): DataFrame = df.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("t"))).as("mv"),
          min(when(col("event_type") === "click", col("t"))).as("mc"),
          min(when(col("event_type") === "purchase", col("t"))).as("mp"))
        .select(col("user_id"),
          when(col("mv").isNull, 0)
            .when(col("mc").isNull || col("mc") <= col("mv"), 1)
            .when(col("mp").isNull || col("mp") <= col("mc"), 2)
            .otherwise(3).as("stage"))
      // coalesce: a global sum over ZERO users returns NULL where the
      // oracle's counting subqueries return 0 — unreachable on real
      // corpora (the max-ts event is always admitted), but the frame
      // should encode the zero-row edge, not rely on the corpus
      def reach(stages: DataFrame, prefix: String): DataFrame = stages.agg(
        coalesce(sum(when(col("stage") >= 1, 1L).otherwise(0L)), lit(0L))
          .as(s"${prefix}_view"),
        coalesce(sum(when(col("stage") >= 2, 1L).otherwise(0L)), lit(0L))
          .as(s"${prefix}_click"),
        coalesce(sum(when(col("stage") >= 3, 1L).otherwise(0L)), lit(0L))
          .as(s"${prefix}_purchase"))
      val counts = late.agg(count(lit(1)).as("n_late_events"))
        .crossJoin(broadcast(onTime.agg(count(lit(1)).as("n_admitted_events"))))
        .crossJoin(broadcast(reach(streamed, "adm")))
        .crossJoin(broadcast(reach(firstTouch(ev), "full")))
      val cert = streamed.withColumnRenamed("stage", "st")
        .join(firstTouch(onTime).withColumnRenamed("stage", "bt"),
          Seq("user_id"), "full_outer")
        .agg(coalesce(sum(when(coalesce(col("st"), lit(0)) =!= coalesce(col("bt"), lit(0)),
          1L).otherwise(0L)), lit(0L)).as("equiv_diff"))
      counts.crossJoin(broadcast(cert))
    },
    s"""WITH ev AS (SELECT user_id, ts, event_type FROM events
       |            WHERE event_type IN ('view', 'click', 'purchase')),
       |cut AS (SELECT date_trunc('milliseconds', max(ts))
       |               - INTERVAL $WatermarkDelayDays DAY AS c FROM ev),
       |adm AS (SELECT ev.* FROM ev, cut WHERE ev.ts > cut.c),
       |astg AS (SELECT user_id,
       |    min(CASE WHEN event_type = 'view' THEN ts END) AS mv,
       |    min(CASE WHEN event_type = 'click' THEN ts END) AS mc,
       |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS mp
       |  FROM adm GROUP BY user_id),
       |asr AS (SELECT CASE WHEN mv IS NULL THEN 0
       |                    WHEN mc IS NULL OR mc <= mv THEN 1
       |                    WHEN mp IS NULL OR mp <= mc THEN 2
       |                    ELSE 3 END AS stage FROM astg),
       |fstg AS (SELECT user_id,
       |    min(CASE WHEN event_type = 'view' THEN ts END) AS mv,
       |    min(CASE WHEN event_type = 'click' THEN ts END) AS mc,
       |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS mp
       |  FROM ev GROUP BY user_id),
       |fsr AS (SELECT CASE WHEN mv IS NULL THEN 0
       |                    WHEN mc IS NULL OR mc <= mv THEN 1
       |                    WHEN mp IS NULL OR mp <= mc THEN 2
       |                    ELSE 3 END AS stage FROM fstg)
       |SELECT
       |  cast((SELECT count(*) FROM ev) - (SELECT count(*) FROM adm) AS bigint) AS n_late_events,
       |  cast((SELECT count(*) FROM adm) AS bigint) AS n_admitted_events,
       |  cast((SELECT count(*) FROM asr WHERE stage >= 1) AS bigint) AS adm_view,
       |  cast((SELECT count(*) FROM asr WHERE stage >= 2) AS bigint) AS adm_click,
       |  cast((SELECT count(*) FROM asr WHERE stage >= 3) AS bigint) AS adm_purchase,
       |  cast((SELECT count(*) FROM fsr WHERE stage >= 1) AS bigint) AS full_view,
       |  cast((SELECT count(*) FROM fsr WHERE stage >= 2) AS bigint) AS full_click,
       |  cast((SELECT count(*) FROM fsr WHERE stage >= 3) AS bigint) AS full_purchase,
       |  cast(0 AS bigint) AS equiv_diff""".stripMargin)

  /** q155: WATERMARK-DELAY CALIBRATION CURVE — the q144/q148 pattern
    * applied to q154: for each delay in [[CalibrationDelaysDays]], the
    * admitted-slice first-touch funnel, the late/admitted event split,
    * and `n_stage_changed` (users whose admitted stage differs from
    * their full-corpus stage — the churn can go BOTH directions, see
    * q154's spec). The 21-day row IS q154's operating point: same cut
    * rule ([[StreamingWatermarkFunnel.cutMicros]]), same stage chain —
    * spec-pinned equal to the streamed certificate, so the curve is
    * anchored to measured watermark behavior, not a parallel
    * definition. This is how the delay is CHOSEN in production: the
    * completeness cost of each candidate horizon, priced before
    * committing state-retention budget to it.
    *
    * Scale: one events scan rides the broadcast 5-row delay lattice
    * (each event fans out only to the horizons that admit it), the
    * per-(delay, user) rollup is map-side combinable, the full-corpus
    * stage frame is computed once and joined user-keyed, and the
    * per-user churn frame is |users| × 5 rows — everything after the
    * first rollup is user- or lattice-bounded; output is 5 rows.
    */
  val q155WatermarkCalibration: QuerySpec = QuerySpec(
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      val maxMicros = ev.agg(max(col("t"))).as[Long].head()
      val lattice = CalibrationDelaysDays
        .map(d => (d, StreamingWatermarkFunnel.cutMicros(maxMicros, d * 86400000L)))
        .toDF("delay_days", "cut")
      def stageCol = when(col("mv").isNull, 0)
        .when(col("mc").isNull || col("mc") <= col("mv"), 1)
        .when(col("mp").isNull || col("mp") <= col("mc"), 2)
        .otherwise(3)
      def minsAgg = Seq(
        min(when(col("event_type") === "view", col("t"))).as("mv"),
        min(when(col("event_type") === "click", col("t"))).as("mc"),
        min(when(col("event_type") === "purchase", col("t"))).as("mp"))
      val adm = ev.join(broadcast(lattice), col("t") > col("cut"))
        .groupBy(col("delay_days"), col("user_id"))
        .agg(minsAgg.head, (minsAgg.tail :+ count(lit(1)).as("n_ev")): _*)
        .select(col("delay_days"), col("user_id"), col("n_ev"),
          stageCol.as("adm_stage"))
      val full = ev.groupBy(col("user_id"))
        .agg(minsAgg.head, minsAgg.tail: _*)
        .select(col("user_id"), stageCol.as("full_stage"))
      // every admitted user has full-corpus events, so the per-user
      // churn frame left-joins the admitted stages onto full × lattice.
      // Zero-event edge (degenerate corpus): `full` is empty, so the
      // curve is 0 rows — and the oracle's `pu` (fsr × lat) is empty
      // too, so BOTH sides agree; the per-group sums below can never
      // see an empty frame (groups exist only where perUser has rows),
      // unlike q154's global reach aggregates (coalesced there)
      val perUser = full
        .crossJoin(broadcast(lattice.select(col("delay_days"))))
        .join(adm.select(col("delay_days"), col("user_id"), col("adm_stage")),
          Seq("delay_days", "user_id"), "left_outer")
      val stages = perUser.groupBy(col("delay_days")).agg(
        sum(when(coalesce(col("adm_stage"), lit(0)) >= 1, 1L).otherwise(0L)).as("adm_view"),
        sum(when(coalesce(col("adm_stage"), lit(0)) >= 2, 1L).otherwise(0L)).as("adm_click"),
        sum(when(coalesce(col("adm_stage"), lit(0)) >= 3, 1L).otherwise(0L)).as("adm_purchase"),
        sum(when(coalesce(col("adm_stage"), lit(0)) =!= col("full_stage"), 1L)
          .otherwise(0L)).as("n_stage_changed"))
      val admitted = adm.groupBy(col("delay_days"))
        .agg(sum(col("n_ev")).as("n_admitted_events"))
      // LEFT join + coalesce (defensive): a horizon admitting ZERO
      // events would report an all-late lattice row instead of
      // vanishing from the curve. Unreachable under the CURRENT cut
      // rule — the cut is the ms-floored max of the same filtered
      // event set, so the max-ts event is admitted at every delay —
      // but the 5-row lattice contract shouldn't depend on that
      // coupling; `stages` always carries all 5 rows (full × lattice)
      // and the oracle mirrors the LEFT join.
      stages.join(admitted, Seq("delay_days"), "left_outer")
        .crossJoin(broadcast(ev.agg(count(lit(1)).as("n_events"))))
        .select(col("delay_days"),
          (col("n_events") - coalesce(col("n_admitted_events"), lit(0L)))
            .as("n_late_events"),
          coalesce(col("n_admitted_events"), lit(0L)).as("n_admitted_events"),
          col("adm_view"), col("adm_click"),
          col("adm_purchase"), col("n_stage_changed"))
        .orderBy(col("delay_days"))
    },
    s"""WITH ev AS (SELECT user_id, event_type, ts FROM events
       |            WHERE event_type IN ('view', 'click', 'purchase')),
       |mx AS (SELECT date_trunc('milliseconds', max(ts)) AS m FROM ev),
       |lat AS (SELECT cast(x.delay_days AS integer) AS delay_days
       |        FROM (VALUES ${CalibrationDelaysDays.map(d => s"($d)").mkString(", ")}) x(delay_days)),
       |cuts AS (SELECT delay_days, m - delay_days * INTERVAL 1 DAY AS c FROM lat, mx),
       |adm AS (SELECT c.delay_days, e.user_id, e.event_type, e.ts
       |        FROM ev e JOIN cuts c ON e.ts > c.c),
       |ast AS (SELECT delay_days, user_id,
       |    min(CASE WHEN event_type = 'view' THEN ts END) AS mv,
       |    min(CASE WHEN event_type = 'click' THEN ts END) AS mc,
       |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS mp,
       |    count(*) AS n_ev
       |  FROM adm GROUP BY delay_days, user_id),
       |asr AS (SELECT delay_days, user_id, n_ev,
       |          CASE WHEN mv IS NULL THEN 0
       |               WHEN mc IS NULL OR mc <= mv THEN 1
       |               WHEN mp IS NULL OR mp <= mc THEN 2
       |               ELSE 3 END AS stage FROM ast),
       |fst AS (SELECT user_id,
       |    min(CASE WHEN event_type = 'view' THEN ts END) AS mv,
       |    min(CASE WHEN event_type = 'click' THEN ts END) AS mc,
       |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS mp
       |  FROM ev GROUP BY user_id),
       |fsr AS (SELECT user_id,
       |          CASE WHEN mv IS NULL THEN 0
       |               WHEN mc IS NULL OR mc <= mv THEN 1
       |               WHEN mp IS NULL OR mp <= mc THEN 2
       |               ELSE 3 END AS stage FROM fst),
       |pu AS (SELECT l.delay_days, f.user_id, f.stage AS full_stage,
       |         coalesce(a.stage, 0) AS adm_stage
       |       FROM fsr f CROSS JOIN lat l
       |       LEFT JOIN asr a ON a.delay_days = l.delay_days AND a.user_id = f.user_id),
       |stg AS (SELECT delay_days,
       |    ${graft.ext.OracleSql.bigSum("CASE WHEN adm_stage >= 1 THEN 1 ELSE 0 END")} AS adm_view,
       |    ${graft.ext.OracleSql.bigSum("CASE WHEN adm_stage >= 2 THEN 1 ELSE 0 END")} AS adm_click,
       |    ${graft.ext.OracleSql.bigSum("CASE WHEN adm_stage >= 3 THEN 1 ELSE 0 END")} AS adm_purchase,
       |    ${graft.ext.OracleSql.bigSum("CASE WHEN adm_stage <> full_stage THEN 1 ELSE 0 END")} AS n_stage_changed
       |  FROM pu GROUP BY delay_days),
       |cnt AS (SELECT delay_days, cast(sum(n_ev) AS bigint) AS n_admitted_events
       |        FROM asr GROUP BY delay_days),
       |tot AS (SELECT cast(count(*) AS bigint) AS n FROM ev)
       |SELECT s.delay_days AS delay_days,
       |  cast(t.n - coalesce(c.n_admitted_events, 0) AS bigint) AS n_late_events,
       |  cast(coalesce(c.n_admitted_events, 0) AS bigint) AS n_admitted_events,
       |  s.adm_view AS adm_view, s.adm_click AS adm_click,
       |  s.adm_purchase AS adm_purchase, s.n_stage_changed AS n_stage_changed
       |FROM stg s LEFT JOIN cnt c ON s.delay_days = c.delay_days CROSS JOIN tot t
       |ORDER BY delay_days""".stripMargin)

  /** q143: STREAMING shard admission — the streaming twin of q141's
    * incremental path, and the last unjudged Structured Streaming join
    * surface: a STREAM-STATIC anti-join. The q141/q142 re-crawl shard
    * (one shared generator — the three admission queries score the same
    * workload) is replayed as micro-batches; each arriving fingerprint
    * is anti-joined against the STATIC at-rest fingerprint state FIRST
    * (stateless, so blocked re-crawls never enter streaming state) and
    * then deduplicated in-stream per (source, fp) (the q77 machinery,
    * bounded state per key — and only novel keys ever reach it). The
    * sink receives exactly the novel fingerprints; the judged row joins
    * the sink rollup with the batch-side seen/blocked margins so the
    * accounting proves admitted + blocked = seen per source.
    *
    * Order independence: the admitted SET per (source, fp) is pure set
    * algebra — static membership is order-blind and in-stream dedup is
    * a union semilattice — so batch boundaries can only change which
    * physical row represents a key, never the judged counts. (Admission
    * is per (source, fp) — the q77 attribution rule; the global
    * first-occurrence semantics live in q141's batch proof.)
    *
    * Scale: the static side is the corpus-proportional fingerprint
    * state — never broadcast-hinted, re-planned per micro-batch by
    * size; streaming state holds one marker per NOVEL (source, fp)
    * only. Production pairs the dedup with
    * `dropDuplicatesWithinWatermark` for bounded retention, exactly as
    * q77 documents.
    */
  val q143StreamingAdmission: QuerySpec = QuerySpec(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // materialized ONCE before the stream starts — the production
      // shape (at-rest state is a stored artifact, not a per-batch
      // recompute) and the harness shape (8 micro-batches would
      // otherwise re-run the corpus distinct 8×); also read by the
      // batch-side margin rollup
      val baseFps = graft.core.Checkpoints.pin(
        docs.select(md5(col("text")).as("fp")).distinct())
      val shard = graft.ext.TextOps.crawlShard(docs).select(col("source"), col("fp"))
      val admitted = replayToSink(s, shard, "q143", dir) { stream =>
        (stream.join(baseFps, Seq("fp"), "left_anti")
          .dropDuplicates("source", "fp"), "append")
      }
      val seen = shard.dropDuplicates("source", "fp")
        .join(baseFps.withColumn("b", lit(1L)), Seq("fp"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_seen"),
          sum(coalesce(col("b"), lit(0L))).as("n_blocked"))
      seen
        .join(admitted.groupBy(col("source")).agg(count(lit(1)).as("n_admitted")),
          Seq("source"), "left")
        .select(col("source"), col("n_seen"), col("n_blocked"),
          coalesce(col("n_admitted"), lit(0L)).as("n_admitted"))
        .orderBy(col("source"))
    },
    s"""WITH ${graft.ext.TextOps.crawlShardSql},
       |basefp AS (SELECT DISTINCT md5(text) AS fp FROM documents),
       |seen AS (SELECT DISTINCT source, fp FROM shard),
       |cls AS (SELECT s.source, CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END AS blocked
       |        FROM seen s LEFT JOIN basefp b ON s.fp = b.fp)
       |SELECT source, cast(count(*) AS bigint) AS n_seen,
       |  ${graft.ext.OracleSql.bigSum("blocked")} AS n_blocked,
       |  ${graft.ext.OracleSql.bigSum("1 - blocked")} AS n_admitted
       |FROM cls GROUP BY source ORDER BY source""".stripMargin)

  /** q157: the STREAMING shard-ingest composition — q117 certifies the
    * batch nightly pipeline end-to-end; this is its streaming twin, and
    * the proof that the judged streaming operators COMPOSE under one
    * checkpoint rather than only working in isolation. ONE file-source
    * replay carries the shard's band rows through BOTH admission legs
    * simultaneously:
    *
    *  - the stream-static corpus probe (q143's operator class): each
    *    arriving band row is probed against the pinned at-rest corpus
    *    bucket set — stateless, so corpus-dup evidence never enters
    *    streaming state;
    *  - the in-batch near-dup detector (q99's operator, verbatim):
    *    [[StreamingNearDup.flagged]] with its O(1) min-doc_id state per
    *    bucket, flagging shard docs that share a bucket with a smaller
    *    shard doc.
    *
    * The two legs union into one append sink under one checkpoint — a
    * stateless and a stateful operator fed by the SAME micro-batches.
    * The consumer derives each shard doc's verdict with q117's priority
    * (dup_of_corpus ≻ dup_in_batch ≻ new; admission = the doc-grain
    * anti probe on both flag sets) and certifies the composition with
    * `equiv_diff`: a full-outer per-doc compare against the batch
    * verdicts frame — the SAME [[graft.ext.TextOps.admissionVerdicts]]
    * plan q117 persists as its nightly artifact, so the certificate is
    * streamed-vs-batch on shared code, not a parallel re-derivation.
    * Judged 0: the streamed composition admits exactly the batch set.
    *
    * Order independence: the corpus probe is per-row set membership
    * (order-blind) and the near-dup leg's flagged set converges to
    * "bucket members except the bucket min" under any batching (q99's
    * contract) — so the union's distinct-doc rollup is replay-order
    * independent, which is what makes the row judgeable.
    *
    * Scale: the at-rest bucket set is corpus-proportional and pinned
    * once, NEVER broadcast-hinted (planner-adaptive per micro-batch —
    * the q101/q143 lesson); streaming state is one 8-byte min per
    * touched bucket; the consumer moves distinct doc_ids and ≤sources
    * rows. The batch certificate leg is the intentionally-full
    * verification pass, exactly q141/q153's convention.
    */
  /** The streamed half of q157 for a given corpus and split: replays
    * the shard band rows through the two composed legs (one checkpoint)
    * and derives each shard doc's verdict with q117's priority. Shared
    * by the judged q157 and StreamingShardIngestSpec's engineered
    * priority bait (the corpora never produce a doc that is BOTH
    * corpus-dup and in-batch-dup, so the priority branch needs an
    * engineered corpus to be exercised at all).
    */
  private[graft] def shardIngestStatuses(s: SparkSession, docs: DataFrame,
      t: Long, tag: String, dir: String): DataFrame = {
    import s.implicits._
    val bands = graft.ext.TextOps.minhashBands(docs)
      .select(col("doc_id"), col("band_id").cast("integer").as("band_id"),
        col("bucket"))
    // at-rest state materialized once before the stream starts (the
    // q143 convention: a stored artifact, not a per-batch recompute)
    val corpusBuckets = graft.core.Checkpoints.pin(
      bands.filter(col("doc_id") < t)
        .select(col("band_id"), col("bucket")).distinct())
    val events = replayToSink(s, bands.filter(col("doc_id") >= t),
      tag, dir) { stream =>
      val corpusHits = stream
        .join(corpusBuckets, Seq("band_id", "bucket"), "left_semi")
        .select(col("doc_id"), lit("c").as("kind"))
      val batchDups = StreamingNearDup.flagged(stream.as[StreamingNearDup.BandRow])
        .toDF().select(col("doc_id"), lit("b").as("kind"))
      (corpusHits.unionByName(batchDups), "append")
    }
    // ONE scan of the bounded sink derives both flag kinds (the same
    // single-materialization discipline the round applied to q153's
    // exactFlags — a per-kind filter+distinct+join pair would scan and
    // join the sink twice for no information gain)
    val flags = events.groupBy(col("doc_id")).agg(
      max(when(col("kind") === "c", 1)).as("dc"),
      max(when(col("kind") === "b", 1)).as("db"))
    docs.filter(col("doc_id") >= t)
      .join(flags, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"),
        when(col("dc") === 1, "dup_of_corpus")
          .when(col("db") === 1, "dup_in_batch")
          .otherwise("new").as("status"))
  }

  val q157StreamingShardIngest: QuerySpec = QuerySpec(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val t = docs.agg(floor((max(col("doc_id")) + 1) * 0.8).cast("long"))
        .head().getLong(0)
      val streamedStatus = shardIngestStatuses(s, docs, t, "q157", dir)
      val batchStatus = graft.ext.TextOps.admissionVerdicts(docs, t)
        .select(col("doc_id"), col("status").as("status_b"))
      // full outer: a doc present on only one side counts as a diff
      // (both legs derive from the same shard slice, so any asymmetry
      // IS a composition bug and must not vanish from the certificate)
      streamedStatus.join(batchStatus, Seq("doc_id"), "full_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_shard"),
          sum(when(col("status") === "dup_of_corpus", 1L).otherwise(0L))
            .as("n_dup_corpus"),
          sum(when(col("status") === "dup_in_batch", 1L).otherwise(0L))
            .as("n_dup_batch"),
          sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_admitted"),
          sum(when(coalesce(col("status"), lit("?"))
            =!= coalesce(col("status_b"), lit("!")), 1L).otherwise(0L))
            .as("equiv_diff"))
        .orderBy(col("source"))
    },
    graft.ext.TextOps.lshChainSql + graft.ext.TextOps.admissionStatusSql +
      s"""
         |SELECT source, cast(count(*) AS bigint) AS n_shard,
         |  ${graft.ext.OracleSql.bigSum("CASE WHEN status = 'dup_of_corpus' THEN 1 ELSE 0 END")} AS n_dup_corpus,
         |  ${graft.ext.OracleSql.bigSum("CASE WHEN status = 'dup_in_batch' THEN 1 ELSE 0 END")} AS n_dup_batch,
         |  ${graft.ext.OracleSql.bigSum("CASE WHEN status = 'new' THEN 1 ELSE 0 END")} AS n_admitted,
         |  cast(0 AS bigint) AS equiv_diff
         |FROM st GROUP BY source ORDER BY source""".stripMargin)

  val all: Map[String, QuerySpec] = Map(
    "q157_streaming_shard_ingest" -> q157StreamingShardIngest,
    "q155_watermark_calibration" -> q155WatermarkCalibration,
    "q154_watermark_funnel" -> q154WatermarkFunnel,
    "q143_streaming_admission" -> q143StreamingAdmission,
    "q99_streaming_neardup" -> q99StreamingNearDup,
    "q137_streaming_image_neardup" -> q137StreamingImageNearDup,
    "q153_streaming_neardup_purge" -> q153StreamingNearDupPurge,
    "q84_stream_stream_join" -> q84StreamStreamJoin,
    "q66_streaming_topk" -> q66StreamingTopK,
    "q68_streaming_retention" -> q68StreamingRetention,
    "q70_streaming_windows" -> q70StreamingWindows,
    "q77_streaming_dedup" -> q77StreamingDedup)
}
