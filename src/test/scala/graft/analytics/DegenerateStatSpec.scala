package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Planted degenerate shapes for the round-11 guard fixes: inputs the
  * sf fixtures never produce (empty segments, one-sided time halves,
  * two-day series) but a real corpus will — each previously crashed
  * (ANSI DIVIDE_BY_ZERO / driver NPE) or emitted engine-divergent
  * Inf/NaN where both twins now agree on NULL or zero rows.
  */
class DegenerateStatSpec extends SparkSpec {
  import spark.implicits._

  private def dir(): String =
    java.nio.file.Files.createTempDirectory("degen_stat").toString

  private def writeEvents(d: String,
      rows: Seq[(Long, String, Long, String, Double)]): Unit =
    rows.map { case (id, ts, u, t, v) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")

  test("stat_trend_daily and stat_mann_kendall yield zero rows on an empty corpus") {
    val d = dir()
    writeEvents(d, Seq.empty)
    // min(day) is NULL here — the pre-fix driver pre-pass NPE'd on
    // .getDate(0).toString before any plan ran
    assert(SparkEntry.queries("stat_trend_daily")(spark, d).count() == 0L)
    assert(SparkEntry.queries("stat_mann_kendall")(spark, d).count() == 0L)
  }

  test("stat_ks_segments drops the empty-segment shape instead of dividing by zero") {
    val d = dir()
    // BUILDING customers only: n2 (MACHINERY) = 0 — pre-fix this was
    // an ANSI DIVIDE_BY_ZERO abort; post-fix the row is dropped in
    // BOTH twins (the statistic is undefined)
    Seq((1L, "BUILDING", 1L), (2L, "BUILDING", 1L))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((10L, 1L, "O", 100.0, java.sql.Date.valueOf("2025-01-01"), "1-URGENT"),
      (11L, 2L, "O", 200.0, java.sql.Date.valueOf("2025-01-02"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    assert(SparkEntry.queries("stat_ks_segments")(spark, d).count() == 0L)
    // and mann-whitney on the same one-sided corpus: nb = 0 zeroes
    // the z denominator — NULL, not the engines' disagreeing x/0.0
    val mw = SparkEntry.queries("stat_mann_whitney")(spark, d)
      .collect().head
    assert(mw.getLong(mw.fieldIndex("n_b")) == 0L)
    assert(mw.isNullAt(mw.fieldIndex("z")), "empty segment must NULL z")
  }

  test("stat_runs_test NULLs z on a two-day corpus and a monotone series") {
    val d = dir()
    // two days -> one up/down move -> n = 1: variance denominator 0
    writeEvents(d, Seq(
      (1L, "2025-02-01 10:00:00", 1L, "click", 1.0),
      (2L, "2025-02-02 10:00:00", 1L, "click", 2.0)))
    val r = SparkEntry.queries("stat_runs_test")(spark, d).collect().head
    assert(r.getLong(0) == 1L && r.isNullAt(r.fieldIndex("z")))
    // five strictly increasing days -> n_down = 0 -> va = 0
    val d2 = dir()
    writeEvents(d2, (1 to 5).map(i =>
      (i.toLong, f"2025-02-0$i 10:00:00", 1L, "click", i.toDouble)))
    val r2 = SparkEntry.queries("stat_runs_test")(spark, d2).collect().head
    assert(r2.getLong(r2.fieldIndex("n_down")) == 0L)
    assert(r2.isNullAt(r2.fieldIndex("z")), "monotone series must NULL z")
  }

  test("dq_distribution_drift NULLs a type confined to one time half") {
    val d = dir()
    // 'old' retires before the midpoint; 'both' spans it
    writeEvents(d, Seq(
      (1L, "2025-03-01 00:00:00", 1L, "old", 1.0),
      (2L, "2025-03-02 00:00:00", 1L, "old", 2.0),
      (3L, "2025-03-01 00:00:00", 2L, "both", 1.0),
      (4L, "2025-03-09 00:00:00", 2L, "both", 5.0))) // defines t1
    val got = SparkEntry.queries("dq_distribution_drift")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.isNullAt(3))).toMap
    assert(got("old")._2 == 0L && got("old")._3,
      s"one-sided type must NULL tvd_ppm: $got")
    assert(got("both")._1 > 0L && got("both")._2 > 0L && !got("both")._3)
  }

  test("layout_encoding_stats reports 0, not NULL, for an all-NULL column") {
    val d = dir()
    // value column entirely NULL: its profile has n_rows NULL — the
    // pre-fix 3VL comparison emitted NULL where the oracle's CASE
    // gives 0. (The profiled columns include events.event_type and
    // events.user_id; an EMPTY events table exercises the same path.)
    writeEvents(d, Seq.empty)
    Seq.empty[(Long, Long, String, Double, Double, Double, Double)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .withColumn("l_returnflag", org.apache.spark.sql.functions.lit("x"))
      .filter("false")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq.empty[(Long, Long, String, Double, java.sql.Date, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("layout_encoding_stats")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("dict_recommended")),
        s"empty column must report 0, not NULL: $r")
      assert(r.getLong(r.fieldIndex("dict_recommended")) == 0L)
    }
  }
}
