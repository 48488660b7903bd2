package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Fires the null-safe op classification of cdc_snapshot_diff — the
  * driver fixture has no NULL values, so only a planted change log
  * exercises it: a NULL→value change must read as an update (not
  * vanish into three-valued logic) and a key whose latest value is
  * NULL must never be mistaken for an absent key.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("NULL-to-value changes are updates; NULL latest values are not inserts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdiff").toString
    val jan10 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val jan20 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    // user 1: NULL value at T1, concrete value at T2  -> update
    // user 2: same state and value both sides          -> no row
    // user 3: only after the cutoff                    -> insert
    // user 4: value NULL at BOTH snapshots, same state -> no row
    Seq(
      (1L, jan10, 10L, "view", Option.empty[Double], "{}"),
      (1L, jan20, 11L, "view", Some(5.0), "{}"),
      (2L, jan10, 20L, "click", Some(1.0), "{}"),
      (3L, jan20, 30L, "signup", Some(2.0), "{}"),
      (4L, jan10, 40L, "view", Option.empty[Double], "{}"))
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")

    val rows = SparkEntry.queries("cdc_snapshot_diff")(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(rows === Map(1L -> "update", 3L -> "insert"),
      s"unexpected ops: $rows")
  }
}
