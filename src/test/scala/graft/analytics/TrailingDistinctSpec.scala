package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** window_trailing_distinct_users edge cases the sf fixture may not
  * exercise: cover intervals that are exactly adjacent (activity gap
  * = window length — must merge contiguously with no phantom dip) and
  * gaps one day wider (must leave exactly one zero-coverage day),
  * checked against a hand-computed census.
  */
class TrailingDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("adjacent covers merge; gap-8 leaves exactly one uncovered day") {
    val dir = java.nio.file.Files.createTempDirectory("graft_twd").toString
    def t(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // user 1 active on days 0 and 7: covers [0,6] ∪ [7,13] = [0,13]
    // user 2 active on days 0 and 8: covers [0,6] ∪ [8,14] — day 7 bare
    Seq(
      (1L, t(0), 1L, "view", 1.0, "{}"),
      (2L, t(7), 1L, "view", 1.0, "{}"),
      (3L, t(0), 2L, "view", 1.0, "{}"),
      (4L, t(8), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("window_trailing_distinct_users")(
      spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // spine = observed activity days 0..8
    val want = Map(
      0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L,
      6L -> 2L, // both users' day-0 cover runs through day 6
      7L -> 1L, // user 1's day-7 activity covers; user 2 has a hole
      8L -> 2L) // user 2 returns
    assert(got == want, s"census differs:\n got $got\nwant $want")
  }
}
