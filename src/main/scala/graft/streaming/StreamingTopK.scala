package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Incremental per-group top-k: a `mapGroupsWithState` operator keeping
  * the k best (value, event_id) pairs per key — the streaming twin of
  * the bounded [[graft.functions.TopK]] batch aggregator. State per key
  * is exactly k entries (a few hundred bytes) no matter how many events
  * stream through — the property that makes "global/ per-key top-k over
  * an unbounded stream" feasible at all.
  *
  * Tie-break (value desc, event_id asc) is total, so the result is
  * deterministic and equal to the batch window-rank form — asserted by
  * `StreamingTopKSpec`.
  */
object StreamingTopK {

  case class Ev(event_type: String, ts: Timestamp, event_id: Long, value: Double)

  case class TopEntry(value: Double, event_id: Long)

  /** One emission per (key, touching batch). `seq` is the key's batch
    * counter, maintained INSIDE the state — the emission with the max
    * seq is the converged one, selectable with `max_by` and no
    * assumption about sink scan order or id monotonicity.
    */
  case class GroupTop(event_type: String, seq: Long, top: Seq[TopEntry])

  // public: the kryo state encoder rejects non-public classes
  case class TopState(seq: Long, top: List[TopEntry])

  def topK(events: Dataset[Ev], k: Int): Dataset[GroupTop] = {
    implicit val outEnc = Encoders.product[GroupTop]
    implicit val stateEnc = Encoders.kryo[TopState]
    implicit val strEnc = Encoders.STRING

    events
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[TopState]) => {
          val prior = state.getOption.getOrElse(TopState(0L, Nil))
          // merge batch into the bounded state: sort once, keep k.
          // (value desc, id asc) is a total order ⇒ deterministic.
          val merged = (prior.top ++ rows.map(e => TopEntry(e.value, e.event_id)))
            .sortBy(t => (-t.value, t.event_id))
            .take(k)
          val next = TopState(prior.seq + 1, merged)
          state.update(next)
          GroupTop(key, next.seq, merged)
        })
  }
}
