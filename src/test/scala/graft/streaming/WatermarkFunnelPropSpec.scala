package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Property-based certification of the q154 per-user state machine
  * ([[StreamingWatermarkFunnel.userTransition]] — pure, so thousands of
  * interleavings run without a streaming harness). The engineered
  * WatermarkFunnelSpec pins the named divergence scenarios and the real
  * two-phase replay; random event sets, arrival orders, batch
  * boundaries and watermark schedules cover the general contracts:
  *
  *  - SEMILATTICE: with the watermark below every event (the phase-1
  *    regime), any shuffle + batching of one event set converges to the
  *    batch first-touch stage — arrival order and boundaries never
  *    matter;
  *  - LATE-DROP: under any MONOTONE watermark schedule, the final state
  *    equals the batch stage over exactly the events that were above
  *    the watermark AT THEIR ARRIVAL batch — dropped rows leave no
  *    trace in state;
  *  - EMISSION: within a lifetime, the row with the highest seq always
  *    carries the final stage and seq increments exactly on admitting
  *    batches; ACROSS a TTL eviction/revival, the consumer's real key
  *    (mark, seq) strictly dominates lifetime-over-lifetime (second
  *    property below), which is what makes max_by(stage, (mark, seq))
  *    converge on the latest lifetime despite the seq restart.
  */
class WatermarkFunnelPropSpec extends AnyFunSuite {
  import StreamingWatermarkFunnel._

  private val Types = Vector("view", "click", "purchase", "error")

  private def ev(tMicros: Long, tpe: String): Ev = {
    val ts = new Timestamp(Math.floorDiv(tMicros, 1000000L) * 1000L)
    ts.setNanos(((tMicros % 1000000L + 1000000L) % 1000000L).toInt * 1000)
    Ev(1L, ts, tpe)
  }

  /** Fold batches through the pure transition under a per-batch
    * watermark schedule; return final state and all emissions.
    */
  private val Fresh = MinState(NoTs, NoTs, NoTs, 0, Long.MinValue)

  private def replay(batches: Seq[(Long, Seq[Ev])]): (MinState, List[StageRow]) =
    batches.foldLeft((Fresh, List.empty[StageRow])) {
      case ((st, acc), (wm, rows)) =>
        val (next, out) = userTransition(1L, st, wm, rows)
        (next, acc ++ out)
    }

  private def bruteStage(events: Seq[(Long, String)]): Int = {
    def m(t: String) =
      events.collect { case (tt, e) if e == t => tt }.minOption.getOrElse(NoTs)
    stageOf(m("view"), m("click"), m("purchase"))
  }

  test("property: order/batching independence and watermark-exact late drops") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caseGen = for {
      n <- Gen.chooseNum(0, 16)
      times <- Gen.listOfN(n, Gen.chooseNum(1L, 40L))
      types <- Gen.listOfN(n, Gen.oneOf(Types))
      // a monotone non-decreasing watermark schedule: random
      // non-negative increments per batch, starting at 0 (Spark's
      // first-batch watermark) — micros granularity here; the
      // engineered spec covers the ms-floor boundary
      nb <- Gen.chooseNum(1, 6)
      incs <- Gen.listOfN(nb, Gen.chooseNum(0L, 15L))
      seed <- Gen.chooseNum(0, Int.MaxValue)
    } yield (times.zip(types), incs, seed)

    val prop = Prop.forAll(caseGen) { case (events, incs, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(events)
      val nb = incs.size
      val batches = shuffled.grouped(math.max(1, (shuffled.size + nb - 1) / nb)).toSeq
        .padTo(nb, Seq.empty)
      val wms = incs.scanLeft(0L)(_ + _).init // starts at 0, monotone
      val schedule = wms.zip(batches.map(_.map { case (t, e) => ev(t, e) }))

      // which events were admitted: above the watermark of THEIR batch
      val admitted = schedule.flatMap { case (wm, rows) =>
        rows.filter(r => {
          val t = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L + r.ts.getNanos / 1000L
          t > wm
        }).map(r => (Math.floorDiv(r.ts.getTime, 1000L) * 1000000L + r.ts.getNanos / 1000L,
          r.event_type))
      }
      val (st, out) = replay(schedule)
      val finalStage = stageOf(st.minV, st.minC, st.minP)
      assert(finalStage == bruteStage(admitted),
        s"state != batch-over-admitted: events=$events incs=$incs seed=$seed")
      // consumer pick: max_by(seq) carries the final stage; seq counts
      // admitting batches exactly
      if (out.nonEmpty) {
        assert(out.maxBy(_.seq).stage == finalStage)
        assert(out.map(_.seq) == (1 to out.size).toList,
          s"seq not dense: ${out.map(_.seq)}")
      } else assert(admitted.isEmpty && finalStage == 0,
        s"silent state mutation: events=$events incs=$incs seed=$seed")

      // semilattice regime: wm 0 everywhere admits everything — a
      // SECOND independent shuffle/batching must converge identically
      val resh = new scala.util.Random(seed + 1).shuffle(events)
      val b2 = resh.grouped(math.max(1, 3)).toSeq.map(_.map { case (t, e) => ev(t, e) })
      val (st2, _) = replay(b2.map(b => (0L, b)))
      assert(stageOf(st2.minV, st2.minC, st2.minP) == bruteStage(events),
        s"wm-0 replay != batch stage: events=$events")
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: post-eviction revival emissions strictly dominate on (mark, seq)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the TTL consumer-convergence theorem (StageRow doc) at the pure
    // level: evict only when the watermark has passed mark + ttl (the
    // operator's own timeout rule), revive with any admitted events
    // above that watermark — every revived emission's (mark, seq) must
    // lexicographically dominate every pre-eviction emission's, so the
    // sink consumer's max_by pick is always the latest lifetime.
    val caseGen = for {
      n1 <- Gen.chooseNum(1, 12)
      times1 <- Gen.listOfN(n1, Gen.chooseNum(1000L, 40000000L)) // micros
      types1 <- Gen.listOfN(n1, Gen.oneOf(Types))
      ttlMs <- Gen.chooseNum(1L, 10L)
      n2 <- Gen.chooseNum(1, 12)
      offs2 <- Gen.listOfN(n2, Gen.chooseNum(1L, 40000L)) // micros above the wm
      types2 <- Gen.listOfN(n2, Gen.oneOf(Types))
    } yield (times1.zip(types1), ttlMs, offs2.zip(types2))

    val prop = Prop.forAll(caseGen) { case (evs1, ttlMs, evs2) =>
      def batched(evs: Seq[Ev], wm: Long) =
        evs.grouped(4).map(b => (wm, b)).toSeq
      val (st1, out1) = replay(batched(evs1.map { case (t, e) => ev(t, e) }, 0L))
      // eviction precondition: the watermark passed mark + ttl
      val wmMs = (if (st1.maxA == Long.MinValue) 0L else st1.maxA) + ttlMs + 1L
      val wmMicros = wmMs * 1000L
      val revived = evs2.map { case (off, e) => ev(wmMicros + off, e) }
      // fresh state = the eviction; the revival batches run above wm
      val (_, out2) = replay(batched(revived, wmMicros))
      val key = (r: StageRow) => (r.mark, r.seq)
      if (out1.nonEmpty && out2.nonEmpty) {
        val maxOld = out1.map(key).max
        val minNew = out2.map(key).min
        assert(Ordering[(Long, Int)].gt(minNew, maxOld),
          s"revival does not dominate: old=$maxOld new=$minNew ttl=$ttlMs")
      }
      // and within each lifetime the key is strictly increasing
      def strictlyInc(rs: List[StageRow]) =
        rs.map(key).sliding(2).forall {
          case List(a, b) => Ordering[(Long, Int)].lt(a, b); case _ => true
        }
      assert(strictlyInc(out1) && strictlyInc(out2))
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
