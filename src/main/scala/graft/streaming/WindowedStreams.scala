package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming window transforms (SURVEY §2.2 streaming rows): tumbling /
  * sliding / session windows with watermarked late-data handling — the
  * time semantics the reference lacks entirely (its only timers are
  * heartbeats).
  *
  * Each takes an unbounded DataFrame with (ts TIMESTAMP, event_type,
  * user_id, value) — the shape of both the `events` testdata table and
  * a parsed Kafka stream — and works identically in batch mode (used by
  * the batch-equivalence specs).
  */
object WindowedStreams {

  /** Tumbling per-channel throughput: the "messages per channel per
    * 10 minutes" operational query. Watermark bounds state: windows
    * older than 30 minutes of event time finalize and evict. */
  def tumblingThroughput(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("approx_users"))

  /** Sliding window: 10-minute window sliding every 5. */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Streaming exact dedup at ingest: drop payload duplicates by
    * content digest while they are within the watermark horizon — the
    * streaming twin of dedup_exact_survivors, and the first gate an
    * LLM-ingest pipeline runs before anything else touches the doc.
    * dropDuplicatesWithinWatermark keeps per-digest state only until
    * the watermark passes it (bounded state), unlike dropDuplicates
    * whose state grows forever on an unbounded stream. Dedup keys on
    * the digest, never the payload — state carries 32 hex chars/row. */
  def dedupedIngest(events: DataFrame): DataFrame =
    events
      .withColumn("digest",
        md5(concat_ws("|", col("event_type"), col("user_id"),
          col("value")).cast("binary")))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("digest")

  /** Streaming OHLC bars — the incremental twin of the batch
    * window_ohlc_hourly resample: per (hour window, event_type),
    * open / high / low / close over integer cents, with open/close as
    * struct min/max over the (event-time μs, event_id, value) total
    * order — THE SAME tie-break the batch query uses, so two events
    * on one timestamp pick the same bar endpoints in both engines
    * (without event_id in the struct, same-second ties would resolve
    * by VALUE in the stream but by event id in the batch). An argmin
    * that runs as a plain streaming aggregate (no per-window sort, no
    * custom state). Watermark finalizes and evicts bars one hour
    * after their window closes. OhlcSpec pins bar-for-bar equality
    * with the batch query's convention on a planted tape. */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .withColumn("tu", unix_micros(col("ts")))
      .withColumn("xc", round(col("value") * 100, 0).cast("long"))
      .withWatermark("ts", "60 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("tu"), col("event_id"), col("xc"))).as("os"),
        max(struct(col("tu"), col("event_id"), col("xc"))).as("cs"),
        max("xc").as("hc"), min("xc").as("lc"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"),
        (col("os.xc") / 100.0).as("open"), (col("hc") / 100.0).as("high"),
        (col("lc") / 100.0).as("low"), (col("cs.xc") / 100.0).as("close"))

  /** Per-user session reconstruction (join→leave spans of the example
    * hub, `example/engine-io.server.js:72-124`): 30-minute inactivity
    * gap closes a session. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))
}
