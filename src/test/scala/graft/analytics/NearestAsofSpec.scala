package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the nearest-in-time as-of composition: the
  * equidistant tie must resolve to the BACKWARD side (documented rule,
  * mirrored in the DuckDB oracle's CASE), each one-sided case must
  * fall through to the existing side, and gaps must be exact seconds.
  */
class NearestAsofSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .drop("sec")

  private def run(rows: (Long, Long, String, Long)*)
      : Map[Long, (Option[Long], Option[Long])] =
    AsofQueries.nearestClickAsof(events(rows: _*))
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap

  test("equidistant clicks tie to the backward side") {
    val out = run(
      (1, 1, "click", 90),
      (2, 1, "click", 110),
      (20, 1, "purchase", 100))
    assert(out(20L) == (Some(1L), Some(10L)))
  }

  test("strictly nearer forward click wins") {
    val out = run(
      (1, 1, "click", 80),
      (2, 1, "click", 105),
      (20, 1, "purchase", 100))
    assert(out(20L) == (Some(2L), Some(5L)))
  }

  test("one-sided cases fall through; no click is null") {
    val out = run(
      (1, 1, "click", 90), (20, 1, "purchase", 100),  // backward only
      (2, 2, "click", 130), (21, 2, "purchase", 100), // forward only
      (22, 3, "purchase", 100))                       // none
    assert(out(20L) == (Some(1L), Some(10L)))
    assert(out(21L) == (Some(2L), Some(30L)))
    assert(out(22L) == (None, None))
  }

  test("same-second click has gap 0 and resolves via the backward max-id rule") {
    val out = run(
      (1, 1, "click", 100),
      (2, 1, "click", 100),
      (20, 1, "purchase", 100))
    // backward side picks max id within the second; gap 0 ties backward
    assert(out(20L) == (Some(2L), Some(0L)))
  }
}
