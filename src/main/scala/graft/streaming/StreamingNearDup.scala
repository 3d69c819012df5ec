package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming PERCEPTUAL near-dup over dHash band buckets (the image
  * q133 scheme run as a stream): unlike [[StreamingNearDup]]'s
  * candidate-level flags, a flag here requires the EXACT Hamming
  * predicate (bit_count(xor) ≤ hamMax), so state must hold (id, sig)
  * members — bounded by the SAME bucket cap the batch scheme drops
  * mega-buckets at (q133's `DHashBucketCap`): arrivals beyond the cap
  * are ignored for the bucket, exactly the batch cap semantics when no
  * bucket saturates (spec-pinned none do on the corpus).
  *
  * Order independence inside the cap: every in-bucket pair within
  * hamMax flags its LARGER id regardless of arrival order — an arrival
  * is flagged when a smaller-id member is within hamMax, and existing
  * larger-id members within hamMax of the arrival are flagged
  * retroactively (the q99 superseded-min protocol generalized to
  * pairs). A member's `flagged` bit makes per-key emission
  * exactly-once; the same id may still be flagged via several band
  * keys — the judged rollup distincts, as q99's does.
  *
  * The final flagged set equals the batch `DISTINCT media_id_b FROM
  * pairs` of q133's banded scheme, which is what the DuckDB oracle
  * replays.
  */
object StreamingHammingDup {

  case class SigBandRow(media_id: Long, sig: Long, band: Int, v: Long)

  case class Flagged(media_id: Long)

  // public: the kryo state encoder rejects non-public classes
  case class Member(id: Long, sig: Long, flagged: Boolean)
  case class BucketState(members: List[Member])

  def flagged(rows: Dataset[SigBandRow], cap: Int, hamMax: Int): Dataset[Flagged] = {
    implicit val outEnc = Encoders.product[Flagged]
    implicit val stateEnc = Encoders.kryo[BucketState]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)

    rows
      .groupByKey(r => (r.band, r.v))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), arrivals: Iterator[SigBandRow],
         state: org.apache.spark.sql.streaming.GroupState[BucketState]) => {
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = List.newBuilder[Long]
          // ascending-id processing makes within-batch emission match
          // the cross-batch protocol (smaller ids are "earlier")
          arrivals.toSeq.sortBy(_.media_id).foreach { r =>
            if (members.lengthCompare(cap) < 0 && !members.exists(_.id == r.media_id)) {
              def near(m: Member): Boolean =
                java.lang.Long.bitCount(m.sig ^ r.sig) <= hamMax
              // retroactive: existing LARGER-id mates of the arrival
              members = members.map { m =>
                if (!m.flagged && m.id > r.media_id && near(m)) {
                  out += m.id; m.copy(flagged = true)
                } else m
              }
              val isDup = members.exists(m => m.id < r.media_id && near(m))
              if (isDup) out += r.media_id
              members = Member(r.media_id, r.sig, isDup) :: members
            }
          }
          state.update(BucketState(members))
          out.result().iterator.map(Flagged)
        })
  }
}

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
