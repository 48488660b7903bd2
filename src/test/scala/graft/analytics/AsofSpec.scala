package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tie coverage for the composed as-of join (VERDICT r1 #10): the
  * equal-second paths — two clicks inside one second, and a click in
  * the purchase's own second — must resolve to the documented
  * max-event_id / at-or-before tiebreak both engines implement.
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String, sec: Long) =
    (id, user, typ, sec)

  private def events(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .drop("sec")

  private def run(rows: (Long, Long, String, Long)*): Map[Long, Option[Long]] =
    AsofQueries.prevClickAsof(events(rows: _*))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("two clicks in the same second: purchase adopts the max event_id") {
    val out = run(
      ev(10, 1, "click", 100),
      ev(11, 1, "click", 100),   // same second, higher id
      ev(20, 1, "purchase", 100))
    assert(out(20L) == Some(11L))
  }

  test("click in the purchase's own second counts (at-or-before, not strictly-before)") {
    val out = run(
      ev(5, 1, "click", 99),
      ev(6, 1, "click", 100),
      ev(20, 1, "purchase", 100))
    assert(out(20L) == Some(6L))
  }

  test("click after the purchase is never adopted; none before -> null") {
    val out = run(
      ev(7, 1, "click", 101),
      ev(20, 1, "purchase", 100),
      ev(8, 2, "click", 50),
      ev(21, 2, "purchase", 60))
    assert(out(20L) == None)
    assert(out(21L) == Some(8L))
  }

  test("ties are per-user: another user's same-second click is invisible") {
    val out = run(
      ev(30, 1, "click", 100),
      ev(31, 2, "click", 100),
      ev(40, 1, "purchase", 100))
    assert(out(40L) == Some(30L))
  }

  private def runFwd(rows: (Long, Long, String, Long)*): Map[Long, Option[Long]] =
    AsofQueries.nextClickAsof(events(rows: _*))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("forward as-of: same-second click counts, ties to the MIN event_id") {
    val out = runFwd(
      ev(10, 1, "click", 100),
      ev(11, 1, "click", 100),   // same second: min id wins forward
      ev(20, 1, "purchase", 100))
    assert(out(20L) == Some(10L))
  }

  test("forward as-of: earlier clicks are invisible; none after -> null") {
    val out = runFwd(
      ev(5, 1, "click", 99),
      ev(20, 1, "purchase", 100),
      ev(6, 1, "click", 105),
      ev(21, 2, "purchase", 60),
      ev(7, 2, "click", 50))
    assert(out(20L) == Some(6L), "nearest following click, not the past one")
    assert(out(21L) == None)
  }
}
