package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Incremental retention-cohort state: per user, the first-activity day
  * (cohort) and the distinct activity days within the retention horizon —
  * the streaming twin of the batch q51 cohort query.
  *
  * State is BOUNDED at horizon+2 ints per user regardless of stream
  * length: cohort = running min day, days = distinct days pruned to
  * [cohort, cohort + horizon]. The pruning is safe under late/out-of-order
  * data: the final cohort is ≤ every interim cohort, so a day outside an
  * interim window (day > cohort_then + horizon ≥ cohort_final + horizon)
  * can never re-enter the final window — dropped means droppable.
  *
  * Replay order independence: (min, set-union-then-prune) is a
  * semilattice merge, so converged per-user state is identical whatever
  * the batch boundaries or file order — the property that lets q68 be
  * JUDGED against the batch oracle rather than batch-parity-only (unlike
  * the order-sensitive funnel; see StreamingFunnelSpec).
  */
object StreamingRetention {

  case class Ev(user_id: Long, day: Int)

  /** One emission per (user, touching batch); `seq` is the per-user
    * batch counter — max seq selects the converged state (as q66).
    */
  case class Emit(user_id: Long, seq: Long, cohort: Int, days: Seq[Int])

  // public: the kryo state encoder rejects non-public classes
  case class RetState(seq: Long, cohort: Int, days: List[Int])

  def retention(events: Dataset[Ev], horizon: Int = 7): Dataset[Emit] = {
    implicit val outEnc = Encoders.product[Emit]
    implicit val stateEnc = Encoders.kryo[RetState]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[RetState]) => {
          val prior = state.getOption.getOrElse(RetState(0L, Int.MaxValue, Nil))
          val batchDays = rows.map(_.day).toList
          val cohort = (prior.cohort :: batchDays).min
          val days = (prior.days ++ batchDays)
            .filter(d => d <= cohort + horizon) // d >= cohort by minimality
            .distinct.sorted
          val next = RetState(prior.seq + 1, cohort, days)
          state.update(next)
          Emit(uid, next.seq, cohort, days)
        })
  }
}
