package graft.analytics

import graft.SparkSpec

/** Independent driver-side replay of cdc_point_in_time: the DuckDB
  * oracle mirrors the query's own window construction, so this third
  * implementation — a literal scan over the sorted per-user history —
  * is what catches a shared-construction bug. Every click's state_at
  * must equal the event_type of the LAST state change at or before it
  * in (ts, event_id) order.
  */
class PointInTimeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("each click carries the state of the last change at or before it") {
    val events = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_timestamp(ts) AS t_s",
        "unix_micros(ts) AS t_us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

    // literal replay: walk each user's (t_us, event_id)-sorted history
    val expect = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var state: String = null
      var prev: String = null
      es.sortBy(e => (e._3, e._4)).toSeq.map { case (u, ts, _, eid, typ) =>
        if (prev == null || prev != typ) state = typ
        prev = typ
        (u, eid) -> ((ts, state))
      }
    }.toMap
    val clickExpect = events.filter(_._5 == "click")
      .map(e => (e._1, e._4) -> expect((e._1, e._4))).toMap

    val got = ExtendedQueries.queries("cdc_point_in_time")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap

    assert(got.keySet === clickExpect.keySet)
    got.foreach { case (k, v) =>
      assert(v === clickExpect(k), s"click $k")
    }
    assert(got.nonEmpty)
  }
}
