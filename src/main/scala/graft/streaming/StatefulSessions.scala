package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` — the batch q30 sessionizer expressed
  * incrementally. Sessions close when (a) a later event in the same user
  * group arrives past the gap, or (b) the event-time watermark passes
  * `session_end + gap` (timeout), bounding state size.
  *
  * State per user is O(1) (one open session), so a 100 TB stream holds
  * |active users| state entries regardless of history length.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class OpenSession(startMicros: Long, endMicros: Long, n: Long, value: Double)

  case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  val DefaultGapMinutes = 30

  /** Apply to a *streaming* Dataset[Event] with a watermark already set on
    * `ts`. Emits closed sessions (Append semantics).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = DefaultGapMinutes): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    val gapMicros = gapMinutes.toLong * 60L * 1000000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) => {
          // micro-precision round trips (Timestamp(millis) would truncate);
          // floorDiv/floorMod keep pre-epoch values correct (truncating
          // division sign-flips the sub-second part for negative millis)
          def toMicros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          def fromMicros(us: Long): Timestamp = {
            val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
            t
          }
          def close(s: OpenSession): Session = Session(
            userId, fromMicros(s.startMicros), fromMicros(s.endMicros), s.n, s.value)

          if (!rows.hasNext && state.hasTimedOut) {
            // watermark passed end+gap: the open session can never extend
            val closed = state.getOption.map(close).iterator
            state.remove()
            closed
          } else {
            val sorted = rows.toVector.sortBy(e => (toMicros(e.ts), e.value))
            var open = state.getOption
            val out = Vector.newBuilder[Session]
            sorted.foreach { e =>
              val t = toMicros(e.ts)
              open match {
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
                case Some(s) if t - s.endMicros > gapMicros =>
                  out += close(s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case Some(s) =>
                  open = Some(OpenSession(s.startMicros, math.max(s.endMicros, t),
                    s.n + 1L, s.value + e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endMicros + gapMicros) / 1000L)
            }
            out.result().iterator
          }
        })
  }
}
