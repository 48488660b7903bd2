package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming CDC latest-state maintenance: the incremental twin of the
  * batch `cdc_latest_state` compaction. Keyed by entity, the state is
  * the current latest row under the (ts desc, event_id desc) order the
  * batch window rank uses; a micro-batch emits one updated snapshot row
  * per key it actually advanced — downstream reconstructs "the table
  * now" as max(version) per key, exactly like [[StreamingTopK]]'s
  * contract.
  *
  * Scale: O(1) state per entity (one row, never the history);
  * late/replayed changes that do not beat the current (ts, event_id)
  * are absorbed silently — idempotent under at-least-once delivery and
  * correct under out-of-order arrival without a watermark, because
  * keep-last under a total order is insensitive to arrival order.
  */
class CdcStream
    extends StatefulProcessor[Long, CdcStream.Change, CdcStream.Snapshot] {
  import CdcStream._

  @transient private var cur: org.apache.spark.sql.streaming.ValueState[Snapshot] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[Snapshot](
      "latest", Encoders.product[Snapshot], TTLConfig.NONE)

  private def beats(c: Change, s: Snapshot): Boolean =
    c.ts > s.last_ts || (c.ts == s.last_ts && c.event_id > s.last_event)

  override def handleInputRows(key: Long, rows: Iterator[Change],
      timers: TimerValues): Iterator[Snapshot] = {
    val prev = if (cur.exists()) Some(cur.get()) else None
    var best = prev
    var version = prev.map(_.version).getOrElse(0L)
    for (r <- rows) {
      if (best.forall(beats(r, _))) {
        best = Some(Snapshot(key, r.ts, r.event_id, r.event_type, r.value,
          version))
      }
    }
    best match {
      case Some(b) if prev.forall(p =>
          (b.last_ts, b.last_event) != (p.last_ts, p.last_event)) =>
        val next = b.copy(version = version + 1)
        cur.update(next)
        Iterator.single(next)
      case _ => Iterator.empty // batch carried nothing newer
    }
  }
}

object CdcStream {
  case class Change(user_id: Long, ts: Long, event_id: Long,
      event_type: String, value: Double)
  case class Snapshot(user_id: Long, last_ts: Long, last_event: Long,
      last_type: String, last_value: Double, version: Long)

  /** Wire latest-state maintenance onto a change stream (RocksDB state
    * store, same provider requirement as [[ChannelProcessor]]). */
  def latestState(changes: Dataset[Change]): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    changes
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new CdcStream(), TimeMode.None(),
        OutputMode.Append())
  }
}
