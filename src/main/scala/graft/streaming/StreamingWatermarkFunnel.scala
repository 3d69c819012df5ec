package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

/** EVENT-TIME-WATERMARKED funnel — the judged q154 machine, closing the
  * one Structured Streaming capability the replay-order contract kept
  * out of the gate (StreamingQueries' header): the order-SENSITIVE q50
  * funnel stays batch-parity-only, but its FIRST-TOUCH variant is a
  * semilattice and can be judged, and the watermark bounds late data
  * deterministically under the two-phase replay below.
  *
  * Funnel semantics (first-touch): per user, over the ADMITTED events,
  *   stage ≥ 1  iff a view exists,
  *   stage ≥ 2  iff min(click) > min(view),
  *   stage ≥ 3  iff stage ≥ 2 and min(purchase) > min(click).
  * State per user is three min-timestamps — each an unconditional MIN
  * over admitted events of one type, i.e. a semilattice merge, so the
  * converged state (and the stage, a pure function of it) is blind to
  * arrival order and batch boundaries. (q50's sequential semantics —
  * "first click after the first view" — is NOT boundedly computable
  * under arbitrary order: a late earlier view can re-qualify a click
  * that bounded state already discarded. First-touch is the standard
  * order-independent funnel refinement; the completeness difference vs
  * q50 on full data is a definition choice, not an approximation.)
  *
  * Watermark admission: the stream declares `withWatermark(ts, delay)`,
  * and the state function drops an arrival iff its event time (micros)
  * is ≤ the CURRENT WATERMARK ([[org.apache.spark.sql.streaming.GroupState.getCurrentWatermarkMs]])
  * — the explicit custom-late-handling pattern for
  * `flatMapGroupsWithState`, where Spark defines watermark semantics
  * but leaves the drop policy to the operator. Emission is the q66/q68
  * update protocol in Append form: each batch that admits rows for a
  * user emits the user's current stage with a per-user `seq`; the
  * consumer keeps `max_by(stage, seq)` — the converged state.
  *
  * Determinism (why this is judgeable): Spark's watermark is
  * `max(event time seen in prior batches) − delay`, which depends on
  * replay order — UNLESS the replay is phased so the watermark is
  * pinned when late rows arrive. [[replayTwoPhase]] stages the ON-TIME
  * slice (ts > cut, where cut = global max ts − delay) and runs it to
  * completion first: every on-time row has ts > cut ≥ watermark at any
  * point of phase 1 (the running max never exceeds the global max), so
  * NONE is dropped, in any file order. The job then RESTARTS FROM
  * CHECKPOINT (the real fault-tolerance machinery — file sink +
  * `_spark_metadata` exactly-once) over the added LATE slice: the
  * restored watermark is exactly `global max − delay` = cut, so EVERY
  * late row (ts ≤ cut) is dropped, in any file order. Admitted set ≡
  * the batch slice `ts > cut` — deterministic, SQL-expressible, judged.
  *
  * The completeness/latency trade this makes measurable: `delay` bounds
  * how long state waits for stragglers (latency/retention cost ∝
  * delay); everything later is EXCLUDED from the funnel (completeness
  * cost = the judged full-vs-admitted margin columns). At 100 TB the
  * per-user state is three longs — and the TTL ([[stages]]' `ttlMs`,
  * armed at the watermark delay by [[replayTwoPhase]]) evicts users
  * quiet past the horizon, bounding state by the ACTIVE user set on an
  * unbounded stream. The TTL is provably inert under the two-phase
  * replay (the watermark never passes the cut — see [[stages]]), so
  * the judged rows are identical with it armed.
  */
object StreamingWatermarkFunnel {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** One per (user, admitting batch); the consumer keeps
    * max_by(stage, (mark, seq)) — lexicographic. `seq` alone is NOT a
    * valid convergence key once the TTL can evict and a user can
    * revive: the revived lifetime restarts seq at 1, so two lifetimes
    * collide on seq and max_by would resolve the tie arbitrarily
    * (possibly resurrecting the stale pre-eviction stage). `mark` — the
    * user's running max ADMITTED event time (ms) — repairs the order:
    * within a lifetime mark is non-decreasing and seq strictly
    * increments, and ACROSS an eviction every revived emission's mark
    * strictly exceeds every prior one's, because eviction requires
    * watermark > mark + ttl and every later admitted event sits above
    * that watermark. So (mark, seq) strictly increases over a user's
    * entire emission history, evictions included, and the max_by pick
    * is always the latest — certified by WatermarkFunnelPropSpec's
    * eviction/revival property.
    */
  case class StageRow(user_id: Long, stage: Int, seq: Int, mark: Long)

  // public: the kryo state encoder rejects non-public classes.
  // maxA = running max admitted event time (ms) — the emission mark and
  // the TTL anchor (timeout = maxA + ttl, so eviction means the user
  // was quiet for ttl past their NEWEST admitted event time, and the
  // revival-dominance argument on [[StageRow]] holds).
  case class MinState(minV: Long, minC: Long, minP: Long, seq: Int, maxA: Long)

  /** Sentinel for "no event of this type admitted yet". */
  val NoTs: Long = Long.MaxValue

  /** The first-touch chain on (min view, min click, min purchase) —
    * shared by the state function and the spec's in-memory brute force
    * so the stage rule cannot drift.
    */
  def stageOf(minV: Long, minC: Long, minP: Long): Int =
    if (minV == NoTs) 0
    else if (minC == NoTs || minC <= minV) 1
    else if (minP == NoTs || minP <= minC) 2
    else 3

  private def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The admission boundary in micros for a corpus max event time
    * (micros) and a watermark delay (ms): Spark tracks max event time
    * MS-FLOORED, so the watermark — and therefore the admitted slice
    * `t > cut` — sits at `(floor(max/1000) − delay)·1000`. Shared by
    * the judged q154 and the q155 calibration curve so the cut rule
    * cannot drift between the streamed certificate and its batch
    * replay lattice.
    */
  def cutMicros(maxMicros: Long, delayMs: Long): Long =
    (Math.floorDiv(maxMicros, 1000L) - delayMs) * 1000L

  /** The per-user transition, PURE: (prior state, current watermark in
    * micros, one micro-batch of the user's arrivals) → (successor
    * state, emitted stage rows). [[stages]] only wires it into
    * `flatMapGroupsWithState`, so the semilattice (order/batching
    * independence) and late-drop contracts are property-testable
    * without a streaming harness (WatermarkFunnelPropSpec).
    */
  def userTransition(userId: Long, prior: MinState, wmMicros: Long,
      arrivals: Seq[Ev]): (MinState, List[StageRow]) = {
    var (v, c, p) = (prior.minV, prior.minC, prior.minP)
    var maxA = prior.maxA
    var admitted = false
    arrivals.foreach { e =>
      val t = toMicros(e.ts)
      if (t > wmMicros) {
        admitted = true
        val tMs = Math.floorDiv(t, 1000L)
        if (tMs > maxA) maxA = tMs
        e.event_type match {
          case "view" => if (t < v) v = t
          case "click" => if (t < c) c = t
          case "purchase" => if (t < p) p = t
          case _ => ()
        }
      }
    }
    if (!admitted) (prior, Nil)
    else {
      val next = MinState(v, c, p, prior.seq + 1, maxA)
      (next, List(StageRow(userId, stageOf(v, c, p), next.seq, maxA)))
    }
  }

  /** The stateful operator. `ttlMs > 0` arms the production state TTL:
    * a user's state carries an event-time timeout of (the user's
    * RUNNING max admitted event time — the state's `maxA`, also emitted
    * as [[StageRow]]'s `mark`) + ttl. Anchoring on the running max
    * rather than the latest batch's max is load-bearing twice: it makes
    * eviction mean "quiet for ttl past the newest admitted EVENT TIME"
    * under any arrival reordering, and it is what guarantees a revived
    * user's mark strictly dominates every pre-eviction mark (the
    * consumer-convergence argument on [[StageRow]]). A user quiet for
    * longer than the TTL past the watermark is EVICTED (state removed, nothing emitted
    * — the sink already holds the user's converged row) and state stays
    * bounded by the ACTIVE user set on an unbounded stream, not by
    * |users| ever seen. The retention trade is explicit: a post-
    * eviction arrival restarts first-touch from empty mins — exactly
    * the data the TTL declared disposable.
    *
    * TTL INERTNESS under the judged two-phase replay (why q154's rows
    * are bit-identical with the TTL armed, for ANY ttl ≥ the watermark
    * delay… in fact any ttl > 0): eviction fires when watermark >
    * lastAdmitted + ttl. In phase 1 every admitted event has ts > cut ≥
    * runningMax − delay = watermark, so lastAdmitted > watermark at all
    * times; in phase 2 late rows (ts ≤ cut < runningMax) never raise
    * the max, the watermark stays pinned at cut, and every retained
    * user has lastAdmitted > cut. Either way watermark ≤ lastAdmitted <
    * lastAdmitted + ttl — no timeout can fire. Asserted by
    * WatermarkFunnelSpec (replay rows identical with TTL armed) and
    * exercised for real by its continuous-stream eviction test, where
    * the watermark DOES pass a quiet user's horizon and the state row
    * count drops.
    */
  def stages(events: Dataset[Ev], ttlMs: Long = 0L): Dataset[StageRow] = {
    implicit val outEnc = Encoders.product[StageRow]
    implicit val stateEnc = Encoders.kryo[MinState]
    implicit val longEnc = Encoders.scalaLong

    val timeoutConf =
      if (ttlMs > 0L) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (userId: Long, rows: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[MinState]) => {
          if (ttlMs > 0L && state.hasTimedOut) {
            // quiet past the horizon: evict. Nothing is emitted — the
            // user's max-(mark, seq) row already in the sink IS the
            // converged answer for every event the TTL retained, and a
            // revival's emissions strictly dominate it (StageRow doc).
            state.remove()
            Iterator.empty
          } else {
            // watermark in ms (0 on the very first batch); event times
            // compare in micros, so the ms-granular watermark boundary is
            // exactly the ms-floored cut [[cutMicros]] encodes
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val prior = state.getOption
              .getOrElse(MinState(NoTs, NoTs, NoTs, 0, Long.MinValue))
            val (next, out) = userTransition(userId, prior, wmMicros, rows.toSeq)
            if (out.nonEmpty) {
              state.update(next)
              // timeout off the RUNNING max admitted event time (the
              // state's mark): an admitted event's ms floor is ≥ the
              // ms watermark, so the timeout lands strictly above the
              // current watermark (Spark rejects timeouts at or below
              // it) — and anchoring on the running max is what makes
              // the post-eviction mark dominance on [[StageRow]] hold.
              if (ttlMs > 0L) state.setTimeoutTimestamp(next.maxA + ttlMs)
            }
            out.iterator
          }
        })
  }

  private val PhaseFiles = 4

  /** Stage `slice` as [[PhaseFiles]] parquet files ONCE per (tag, scale,
    * process) — the replayToSink memoized-stage contract — and return
    * the staged file paths.
    */
  private def stageSlice(slice: DataFrame, tag: String, dir: String): Seq[java.nio.file.Path] = {
    val staged = graft.core.Staging.sharedDir(s"graft_replay_$tag", dir)
    val marker = Paths.get(staged, "_STAGED")
    if (!Files.exists(marker)) {
      slice.repartition(PhaseFiles).write.mode("overwrite").parquet(staged)
      Files.createFile(marker): Unit
    }
    graft.core.Fs.listDir(Paths.get(staged))
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
  }

  /** The deterministic two-phase watermark replay (see the object doc):
    * phase 1 streams the staged on-time files through [[stages]] into a
    * PARQUET sink (append, checkpointed), phase 2 hard-links the late
    * files into the same source dir and RESTARTS the identical query
    * from the checkpoint — the restored watermark (= cut) then drops
    * every late row. Staged slices are shared per process; the work dir
    * (source links + sink + checkpoint) is per-invocation, swept by the
    * sequential drivers between queries. Serialized on [[ReplayLock]]
    * — SHARED with StreamingQueries.replayToSink, because both
    * harnesses resize the same session-global shuffle-partition conf
    * (replays are harness, sized to the replay, restored after).
    */
  def replayTwoPhase(s: SparkSession, onTime: DataFrame, late: DataFrame,
      tag: String, dir: String, delayMs: Long): DataFrame = ReplayLock.synchronized {
    val onTimeFiles = stageSlice(onTime, s"${tag}_ontime", dir)
    val lateFiles = stageSlice(late, s"${tag}_late", dir)
    val work = graft.core.Staging.invocationDir(s"graft_replay_${tag}_work", dir)
    val src = Paths.get(work, "src"); Files.createDirectories(src)
    val out = Paths.get(work, "out").toString
    val cp = Paths.get(work, "cp").toString
    val partsConf = "spark.sql.shuffle.partitions"
    val prevParts = s.conf.get(partsConf)
    try {
      s.conf.set(partsConf, PhaseFiles.toString)
      def runPhase(): Unit = {
        import s.implicits._
        val stream = s.readStream.schema(onTime.schema)
          .option("maxFilesPerTrigger", "1").parquet(src.toString)
          .withWatermark("ts", s"$delayMs milliseconds")
          .as[Ev]
        // TTL armed at the watermark delay itself — the production
        // retention shape — and provably inert here (see [[stages]]:
        // the watermark never passes the cut, so no user's horizon is
        // ever reached during the replay)
        val q = stages(stream, ttlMs = delayMs).toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      onTimeFiles.zipWithIndex.foreach { case (f, i) =>
        Files.createLink(src.resolve(f"a$i%03d.parquet"), f): Unit
      }
      runPhase()
      val phase1Rows = s.read.parquet(out).count()
      lateFiles.zipWithIndex.foreach { case (f, i) =>
        Files.createLink(src.resolve(f"b$i%03d.parquet"), f): Unit
      }
      runPhase()
      val sink = s.read.parquet(out)
      // The determinism contract asserted DIRECTLY, not left to the
      // judged equiv_diff: phase 2 replays only late rows (ts ≤ cut),
      // and the restored watermark equals cut only because Spark's
      // commit log persists the next-batch watermark across a restart
      // — a version-sensitive internal. If an upgrade changes that,
      // late rows would be admitted and emit stage rows; fail fast
      // here with the cause named instead of surfacing as a silent
      // oracle mismatch downstream.
      val phase2Rows = sink.count()
      if (phase2Rows != phase1Rows) throw new IllegalStateException(
        s"watermark replay contract violated: the checkpoint-restarted " +
        s"phase 2 emitted ${phase2Rows - phase1Rows} rows over the late " +
        s"slice (sink $phase1Rows -> $phase2Rows). The restored watermark " +
        s"no longer pins at the cut — Spark's commit-log watermark " +
        s"persistence semantics have changed.")
      sink
    } finally {
      s.conf.set(partsConf, prevParts)
    }
  }
}
