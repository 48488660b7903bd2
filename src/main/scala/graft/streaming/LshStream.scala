package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming NEAR-dup gate: the incremental twin of the batch
  * MinHash+LSH candidate pipeline (`dedup_lsh_candidates`). Each
  * incoming doc's signature explodes into its band buckets map-side;
  * this keyed stage holds, per (band_idx, band_hash) bucket, the
  * bucket's FIRST-SEEN doc and a running occupancy count, and flags
  * every later arrival in the bucket as a near-dup candidate of that
  * canonical doc. A doc flagged by ANY band is a candidate (the
  * standard OR-over-bands LSH rule); the downstream verify step —
  * exact jaccard on candidate pairs only — is the same one batch runs.
  *
  * Scale: state per bucket is TWO longs (canonical, count) — bounded
  * by distinct band values, not stream volume; signatures never enter
  * state. Hot buckets degrade PROSPECTIVELY: once occupancy passes
  * [[LshStream.MaxBucket]] the bucket stops emitting candidates (the
  * batch pipeline's retroactive whole-bucket drop cannot be expressed
  * without retraction in a stream; both caps bound candidate volume
  * by MaxBucket per bucket, and the batch run over the landed corpus
  * remains the authority — the stream gate is the cheap front filter).
  * Decisions are idempotent under at-least-once replay: the canonical
  * never changes once set, so a replayed (doc, band) row re-derives
  * the identical flag.
  */
class LshStream
    extends StatefulProcessor[String, LshStream.BandEvent, LshStream.BandHit] {
  import LshStream._

  @transient private var bucket: org.apache.spark.sql.streaming.ValueState[BucketState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bucket = getHandle.getValueState[BucketState](
      "bucket", Encoders.product[BucketState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BandEvent],
      timers: TimerValues): Iterator[BandHit] = {
    // deterministic within a batch regardless of arrival order
    val rs = rows.toSeq.sortBy(_.doc_id)
    var st = if (bucket.exists()) bucket.get() else BucketState(-1L, 0L)
    val out = rs.flatMap { r =>
      if (st.canonical < 0) { st = BucketState(r.doc_id, 1L); None }
      else if (r.doc_id == st.canonical) None // at-least-once replay
      else {
        st = st.copy(n_seen = st.n_seen + 1)
        if (st.n_seen <= MaxBucket)
          Some(BandHit(r.doc_id, r.band_idx, r.band_hash, st.canonical))
        else None // hot bucket: stop emitting, occupancy keeps counting
      }
    }
    bucket.update(st)
    out.iterator
  }
}

object LshStream {
  /** Same hot-bucket bound as the batch pipeline (DedupQueries). */
  val MaxBucket = 64L

  case class BandEvent(doc_id: Long, band_idx: Int, band_hash: Long)
  case class BucketState(canonical: Long, n_seen: Long)
  case class BandHit(doc_id: Long, band_idx: Int, band_hash: Long,
      candidate_of: Long)

  /** Wire the gate onto a pre-banded (doc_id, band_idx, band_hash)
    * stream — the map-side banding (native MinHash signature + band
    * hashes) is the SAME expression pipeline the batch dedup uses, so
    * stream and batch agree on what lands in a bucket. Keyed by the
    * (band_idx, band_hash) pair rendered as one string key. */
  def gate(bands: Dataset[(Long, Int, Long)]): Dataset[BandHit] = {
    val s = bands.sparkSession
    import s.implicits._
    bands.toDF("doc_id", "band_idx", "band_hash")
      .as[BandEvent]
      .groupByKey(e => s"${e.band_idx}:${e.band_hash}")(Encoders.STRING)
      .transformWithState(new LshStream(), TimeMode.None(),
        OutputMode.Append())(Encoders.product[BandHit])
  }
}
