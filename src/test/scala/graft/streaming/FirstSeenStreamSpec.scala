package graft.streaming

import graft.{SparkSpec, Tables}
import FirstSeenStream._

/** The streaming first-seen gate must emit exactly once per entity,
  * collapse intra-batch disorder to the min coordinate, absorb
  * redelivery and later activity silently, and — run over the real
  * events table — reproduce the batch behavior_cumulative_users
  * new-users-per-day aggregate exactly.
  */
class FirstSeenStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Obs]]): Seq[FirstSeen] =
    runRocksDbStream(batches)(FirstSeenStream.firstSeen(_))

  test("one emission per entity, first batch wins") {
    val out = run(Seq(
      Seq(Obs(1L, 10L, 100L), Obs(2L, 10L, 120L)),
      Seq(Obs(1L, 11L, 200L), Obs(3L, 11L, 210L)),
      Seq(Obs(2L, 12L, 300L), Obs(1L, 12L, 310L))))
    assert(out.map(_.user_id).sorted === Seq(1L, 2L, 3L))
    val byKey = out.map(f => f.user_id -> f).toMap
    assert(byKey(1L).first_day === 10L && byKey(1L).first_ts === 100L)
    assert(byKey(3L).first_day === 11L)
  }

  test("intra-batch disorder collapses to the min (day, ts)") {
    val out = run(Seq(Seq(
      Obs(7L, 20L, 900L), Obs(7L, 19L, 950L), Obs(7L, 19L, 940L))))
    assert(out.size === 1)
    assert(out.head.first_day === 19L && out.head.first_ts === 940L)
  }

  test("redelivery of the first row never re-emits") {
    val first = Seq(Obs(5L, 30L, 400L))
    val out = run(Seq(first, first, first))
    assert(out.size === 1)
  }

  test("streaming first-seen days reproduce the batch new-users-per-day " +
    "aggregate on the real events table") {
    val sf = "/root/testdata/sf0.001"
    val obs = Tables.events(spark, sf)
      .selectExpr("user_id",
        "cast(floor(unix_timestamp(ts) / 86400) as long) as day",
        "cast(unix_timestamp(ts) as long) as ts")
      .as[Obs].collect().toSeq
      // in-order delivery (the Kafka-partition-by-key contract, as in
      // EwmaStreamSpec): equivalence to the batch min-day aggregate
      // requires a user's earliest event to arrive no later than their
      // other events
      .sortBy(o => (o.ts, o.user_id))
    val chunks = obs.grouped((obs.size / 3).max(1)).toSeq
    val out = run(chunks)
    val gotNewPerDay = out.groupBy(_.first_day).view
      .mapValues(_.size.toLong).toMap
    val batch = graft.analytics.InsightQueries
      .queries("behavior_cumulative_users")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2 > 0L).toMap
    assert(gotNewPerDay === batch)
    assert(out.size.toLong === batch.values.sum)
  }
}
