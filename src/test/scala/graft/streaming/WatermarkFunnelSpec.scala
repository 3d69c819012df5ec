package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Certificates for the q154 watermark funnel that the DuckDB oracle
  * cannot see (the oracle replays the same admitted-slice definition,
  * so a broken watermark that admitted everything — or nothing — could
  * still hash-match a correspondingly broken slice). Engineered events
  * prove the two-phase replay drops EXACTLY the late slice and that the
  * drop changes stages in both directions; the sf0.001 run proves the
  * judged row is non-degenerate on real data.
  */
class WatermarkFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Engineered corpus, delay "1 days", max = 2024-01-10 00:00:00 so
    * cut = 2024-01-09 00:00:00 (whole-second max ⇒ the ms floor is
    * exact). Late events sit strictly before the cut; every divergence
    * mode is represented:
    *  - u1: full chain LATE + one on-time view → admitted 1, full 3
    *    (the funnel happened, but before the horizon — completeness
    *    loss)
    *  - u2: only a LATE view                   → absent (0), full 1
    *  - u3: LATE click before its on-time view → admitted 2, full 1
    *    (dropping the early click RAISES the first-touch stage — the
    *    completeness trade is not monotone)
    *  - u4: on-time click at/before its view   → stage 1 both ways
    *  - u5: the full on-time chain + max anchor → stage 3 both ways
    */
  private val onTime = Seq(
    (1L, "2024-01-09 10:00:00", "view"),
    (3L, "2024-01-09 10:00:00", "view"), (3L, "2024-01-09 12:00:00", "click"),
    (4L, "2024-01-09 10:00:00.25", "click"), (4L, "2024-01-09 10:00:00.25", "view"),
    (5L, "2024-01-09 08:00:00", "view"), (5L, "2024-01-09 09:00:00", "click"),
    (5L, "2024-01-09 09:30:00", "purchase"), (5L, "2024-01-10 00:00:00", "view"))
  private val late = Seq(
    (1L, "2024-01-05 10:00:00", "view"), (1L, "2024-01-06 10:00:00", "click"),
    (1L, "2024-01-08 10:00:00", "purchase"),
    (2L, "2024-01-05 10:00:00", "view"),
    (3L, "2024-01-05 10:00:00", "click"))
  private val admittedStages = Map(1L -> 1, 3L -> 2, 4L -> 1, 5L -> 3)
  private val fullStages = Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 3)

  private def df(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")
  }

  private def streamedStages(tag: String): Map[Long, Int] =
    StreamingWatermarkFunnel.replayTwoPhase(spark, df(onTime), df(late),
      tag, "specwmf", 86400000L)
      .groupBy(col("user_id"))
      .agg(max_by(col("stage"), struct(col("mark"), col("seq"))).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("two-phase replay admits exactly the on-time slice, both divergence directions") {
    // the engineered maps are themselves cross-checked against the
    // shared stage rule before anything streams
    def brute(rows: Seq[(Long, String, String)]): Map[Long, Int] =
      rows.groupBy(_._1).map { case (u, es) =>
        def m(t: String) = es.filter(_._3 == t).map(e => ts(e._2).getTime * 1000L)
          .minOption.getOrElse(StreamingWatermarkFunnel.NoTs)
        u -> StreamingWatermarkFunnel.stageOf(m("view"), m("click"), m("purchase"))
      }
    assert(brute(onTime) == admittedStages, "on-time brute-force sanity")
    assert(brute(onTime ++ late) == fullStages, "full brute-force sanity")
    // the watermark is load-bearing in BOTH directions: late data
    // raises u1 (2→3) and LOWERS u3 (2→1)
    assert(admittedStages(1L) < fullStages(1L) && admittedStages(3L) > fullStages(3L))

    val streamed = streamedStages("wmfspec")
    assert(streamed == admittedStages,
      s"streamed=$streamed expected=$admittedStages")
  }

  test("two-phase replay is reproducible run-to-run (fresh checkpoint, same staged input)") {
    assert(streamedStages("wmfspec") == admittedStages)
  }

  test("q155's 21-day row is exactly q154's streamed operating point at sf0.001") {
    // anchors the calibration curve to MEASURED watermark behavior: the
    // shared cut rule + stage chain mean the 21-day batch row must
    // reproduce what the two-phase streamed run certified
    val sf = TestSpark.testdata("0.001")
    val q154 = graft.SparkEntry.queries("q154_watermark_funnel")(spark, sf).collect().head
    val row21 = graft.SparkEntry.queries("q155_watermark_calibration")(spark, sf)
      .filter(col("delay_days") === 21).collect().head
    def g(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    for (c <- Seq("n_late_events", "n_admitted_events",
        "adm_view", "adm_click", "adm_purchase"))
      assert(g(row21, c) == g(q154, c), s"$c: curve=${g(row21, c)} streamed=${g(q154, c)}")

    // curve non-degeneracy: admitted volume must grow with the horizon
    // and the endpoints must genuinely differ (a flat curve would make
    // the calibration meaningless)
    val curve = graft.SparkEntry.queries("q155_watermark_calibration")(spark, sf)
      .orderBy(col("delay_days")).collect().toSeq
    val admitted = curve.map(r => g(r, "n_admitted_events"))
    assert(admitted == admitted.sorted, s"admitted not monotone: $admitted")
    assert(admitted.last > admitted.head, s"flat calibration curve: $admitted")
  }

  test("state TTL evicts users quiet past the horizon on a continuous stream") {
    // The production leg the two-phase replay can never reach (the
    // watermark never passes the cut there — the inertness theorem on
    // [[StreamingWatermarkFunnel.stages]], which the replay tests above
    // now assert with the TTL ARMED). Here the watermark genuinely
    // advances past a quiet user's horizon: eviction is proven
    // behaviorally, through the emission protocol — a post-eviction
    // arrival restarts state from empty, so its row carries seq = 1
    // AGAIN and a stage computed from fresh mins (the declared
    // retention trade). With retained state the same arrival would
    // emit seq = 2 and the full-history stage, so the assertion cannot
    // pass without an eviction.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingWatermarkFunnel.Ev
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    // delay 10 s, TTL 10 s
    val stream = in.toDS().withWatermark("ts", "10 seconds").as[Ev]
    val q = StreamingWatermarkFunnel.stages(stream, ttlMs = 10000L).toDF()
      .writeStream.format("memory").queryName("wmf_ttl_sink")
      .outputMode("append").start()
    try {
      def batch(evs: Ev*): Unit = { in.addData(evs); q.processAllAvailable() }
      // b1: u1 completes view→click (stage 2, seq 1);
      //     timeout = 00:11:00 + 10 s
      batch(Ev(1L, ts("2024-01-01 00:10:00"), "view"),
        Ev(1L, ts("2024-01-01 00:11:00"), "click"))
      // b2: watermark driver — during b2 wm = 00:10:50 < u1's horizon,
      //     after it wm = 00:59:50 > 00:11:10
      batch(Ev(9L, ts("2024-01-01 01:00:00"), "view"))
      // b3: the batch that processes u1's timeout → u1 EVICTED
      batch(Ev(9L, ts("2024-01-01 01:01:00"), "view"))
      // b4: u1 returns (admitted: 02:00 > wm 01:00:50) — fresh state
      batch(Ev(1L, ts("2024-01-01 02:00:00"), "purchase"))
      val u1 = spark.table("wmf_ttl_sink").filter(col("user_id") === 1L)
        .select(col("stage"), col("seq"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      // (2,1) from b1; (0,1) from b4 — seq restarted at 1 and the
      // purchase-only state stages at 0. Retained state would have
      // produced (3,2) instead of (0,1).
      assert(u1 == Set((2, 1), (0, 1)),
        s"u1 rows $u1 — state was not evicted (expected seq restart after TTL)")
      // the convergence key survives the seq collision: both u1 rows
      // carry seq 1, and max_by(stage, (mark, seq)) must pick the
      // POST-eviction row (stage 0 — the declared retention trade),
      // never resurrect the stale pre-eviction stage 2
      val converged = spark.table("wmf_ttl_sink")
        .groupBy(col("user_id"))
        .agg(max_by(col("stage"), struct(col("mark"), col("seq"))).as("stage"))
        .filter(col("user_id") === 1L)
        .collect().head.getInt(1)
      assert(converged == 0,
        s"consumer resurrected a pre-eviction stage: got $converged, want 0")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS wmf_ttl_sink"): Unit
    }
  }

  test("judged q154 row is non-degenerate at sf0.001") {
    val row = graft.SparkEntry.queries("q154_watermark_funnel")(
      spark, TestSpark.testdata("0.001")).collect().head
    def g(n: String) = row.getLong(row.fieldIndex(n))
    assert(g("n_late_events") > 0L, "late slice empty — watermark vacuous")
    assert(g("n_admitted_events") > 0L, "admitted slice empty — funnel vacuous")
    assert(g("equiv_diff") == 0L)
    val adm = (g("adm_view"), g("adm_click"), g("adm_purchase"))
    val full = (g("full_view"), g("full_click"), g("full_purchase"))
    assert(adm != full,
      s"admitted funnel $adm equals full funnel $full — the completeness trade is invisible")
  }
}
