package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Property-based certification of [[StreamingHammingDup]]'s per-bucket
  * state machine ([[StreamingHammingDup.bucketTransition]] — pure, so
  * no streaming harness is needed and thousands of interleavings run in
  * milliseconds). The engineered StreamingNearDupSpec cases pin the
  * named scenarios; random operation sets, arrival orders, batch
  * boundaries and purge mixes cover what hand-built cases can't:
  *
  *  - ORDER/BATCHING INDEPENDENCE: two independent shuffles +
  *    batchings of one operation set converge to the same netted
  *    consumer output (the judged q137/q153 replay contract);
  *  - BATCH EQUIVALENCE, total: the exactFlags composition (netted
  *    deltas, or the live-corpus re-seed when tombstoned) equals the
  *    batch `HAVING count(*) <= cap` brute force in EVERY case,
  *    saturation included;
  *  - DELTA TELESCOPING: per-id deltas net to exactly the final flag
  *    bit (0 or 1) in non-tombstoned buckets — append-mode emission
  *    never double-counts;
  *  - BOUNDED STATE: members (live + dead) never exceed the cap.
  *
  * One id maps to one signature (drawn by id), as in production where
  * the signature derives from the id's own content — the machine's
  * first-arrival-wins member insert is only order-independent under
  * that invariant.
  */
class StreamingNearDupPropSpec extends AnyFunSuite {
  import StreamingHammingDup._

  private val Key = (0, 7L)
  private val HamMax = 2
  // mixed distances: some pairs within HamMax (0x00/0x01/0x03,
  // 0xF0/0xF1), some far apart — near-ness is id-dependent but not
  // universal, so flags and retractions both fire
  private val Sigs = Vector(0x00L, 0x01L, 0x03L, 0xF0L, 0xF1L, 0xFFL)
  private def sigOf(id: Long): Long = Sigs((id % Sigs.size).toInt)

  private case class Op(id: Long, purge: Boolean) {
    def row: SigBandRow = SigBandRow(id, sigOf(id), Key._1, Key._2, purge)
  }

  /** Fold a batching of ops through the pure transition; return the
    * final state and every emitted event.
    */
  private def replay(batches: Seq[Seq[Op]], cap: Int): (BucketState, List[NetEvent]) =
    batches.foldLeft((BucketState(Nil, saturated = false), List.empty[NetEvent])) {
      case ((st, acc), batch) =>
        val (next, out) = bucketTransition(Key, st, batch.map(_.row), cap, HamMax)
        (next, acc ++ out)
    }

  /** The q137/q153 consumer netting in plain Scala: tombstoned bucket
    * contributes nothing; else ids whose deltas net positive.
    */
  private def netted(events: List[NetEvent]): Set[Long] =
    if (events.exists(_.tomb)) Set.empty
    else events.groupBy(_.media_id).collect {
      case (id, es) if es.map(_.delta).sum > 0 => id
    }.toSet

  /** Batch brute force over the LIVE membership (admitted minus purged;
    * a purge without an admit still kills the id) with the HAVING cap.
    */
  private def brute(ops: Seq[Op], cap: Int): Set[Long] = {
    val purged = ops.filter(_.purge).map(_.id).toSet
    val live = ops.filterNot(o => purged.contains(o.id)).map(_.id).distinct
    if (live.size > cap) Set.empty
    else (for {
      x <- live; y <- live
      if x < y && java.lang.Long.bitCount(sigOf(x) ^ sigOf(y)) <= HamMax
    } yield y).toSet
  }

  /** exactFlags' composition at the pure level: netted deltas for live
    * buckets, the live-membership re-seed for tombstoned ones.
    */
  private def exactTotal(events: List[NetEvent], ops: Seq[Op], cap: Int): Set[Long] =
    if (events.exists(_.tomb)) brute(ops, cap) else netted(events)

  test("property: random interleavings converge to the batch semantics in every regime") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val opsGen = for {
      n <- Gen.chooseNum(0, 22)
      ids <- Gen.listOfN(n, Gen.chooseNum(1L, 12L))
      purges <- Gen.listOfN(n, Gen.prob(0.3))
      cap <- Gen.chooseNum(2, 6)
      seed1 <- Gen.chooseNum(0, Int.MaxValue)
      seed2 <- Gen.chooseNum(0, Int.MaxValue)
    } yield (ids.zip(purges).map { case (i, p) => Op(i, p) }, cap, seed1, seed2)

    def arrange(ops: Seq[Op], seed: Int): Seq[Seq[Op]] = {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(ops)
      // random batch boundaries, empty batches allowed
      if (shuffled.isEmpty) Seq(Seq.empty)
      else {
        val cuts = Seq.fill(shuffled.size)(rnd.nextInt(4) == 0)
        shuffled.zip(cuts).foldLeft(List(List.empty[Op])) {
          case (h :: t, (op, cut)) =>
            if (cut) List(op) :: (h :: t) else (h :+ op) :: t
          case (Nil, _) => Nil // unreachable
        }.reverse
      }
    }

    val prop = Prop.forAll(opsGen) { case (ops, cap, s1, s2) =>
      val (st1, ev1) = replay(arrange(ops, s1), cap)
      val (st2, ev2) = replay(arrange(ops, s2), cap)

      // bounded state, both replays
      assert(st1.members.size <= cap && st2.members.size <= cap,
        s"state exceeded cap: ${st1.members.size}/${st2.members.size} > $cap")
      // order/batching independence of the consumer output
      assert(netted(ev1) == netted(ev2),
        s"netted diverged across orders: ${netted(ev1)} vs ${netted(ev2)} ops=$ops cap=$cap")
      assert(st1.saturated == st2.saturated,
        s"saturation order-dependent: ops=$ops cap=$cap")
      // the total-consumer theorem, saturation included
      val expect = brute(ops, cap)
      assert(exactTotal(ev1, ops, cap) == expect,
        s"exactFlags != batch: got=${exactTotal(ev1, ops, cap)} want=$expect ops=$ops cap=$cap")
      // non-tombstoned: netted == batch AND per-id deltas telescope to
      // the final flag bit
      if (!ev1.exists(_.tomb)) {
        assert(netted(ev1) == expect, s"netted != batch: ops=$ops cap=$cap")
        ev1.groupBy(_.media_id).foreach { case (id, es) =>
          val net = es.map(_.delta).sum
          assert(net == 0 || net == 1, s"delta sum $net for id $id: ops=$ops cap=$cap")
        }
      }
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
