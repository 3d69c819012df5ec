package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection over MinHash LSH band buckets: a
  * document is a near-dup candidate when some band bucket contains a
  * document with a SMALLER doc_id — the streaming twin of the batch
  * `DISTINCT doc_b FROM lshPairs` set.
  *
  * State per (band, bucket) key is the MINIMUM doc_id seen — 8 bytes,
  * O(1) — never a member list: on a 100 TB stream the hot buckets
  * (boilerplate-heavy shingle space) would otherwise accumulate
  * unbounded membership. The emission protocol makes the bounded state
  * sufficient:
  *
  *  - a batch's ids above the running min are flagged immediately;
  *  - when a batch SUPERSEDES the running min, the old min is flagged
  *    retroactively (it has a bucket-mate with a smaller id now).
  *
  * Each id is emitted at most once per key (ids arrive once per key —
  * one band row per doc per band — and an id is emitted exactly when it
  * first stops being, or never was, the key's min), so append mode
  * needs no converged-state selection. The FINAL flagged set is "bucket
  * members except the global min" regardless of arrival order or batch
  * boundaries — asserted equal to the batch form by
  * `StreamingNearDupSpec`.
  */
object StreamingNearDup {

  case class BandRow(doc_id: Long, band_id: Int, bucket: String)

  case class Flagged(doc_id: Long)

  // public: the kryo state encoder rejects non-public classes
  case class MinState(minId: Long)

  def flagged(bands: Dataset[BandRow]): Dataset[Flagged] = {
    implicit val outEnc = Encoders.product[Flagged]
    implicit val stateEnc = Encoders.kryo[MinState]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)

    bands
      .groupByKey(r => (r.band_id, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), rows: Iterator[BandRow],
         state: org.apache.spark.sql.streaming.GroupState[MinState]) => {
          val arrived = rows.map(_.doc_id).toVector
          val all = state.getOption.map(_.minId).toVector ++ arrived
          val newMin = all.min
          state.update(MinState(newMin))
          all.iterator.filter(_ != newMin).map(Flagged)
        })
  }
}
