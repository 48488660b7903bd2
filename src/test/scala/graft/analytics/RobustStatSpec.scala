package graft.analytics

import graft.SparkSpec

/** Literal replays of the robust-stat queries: median/MAD by sorting
  * collected cents values (lower-median convention) and mode by
  * (count, value) comparison — third implementations beside the
  * value-count-cumsum plan and the row_number oracle.
  */
class RobustStatSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def centsByType: Map[String, Seq[Long]] =
    graft.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS xc")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((s.length + 1) / 2) - 1)
  }

  test("stat_mad_daily equals the sorted-scan replay") {
    val got = StatQueries.queries("stat_mad_daily")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val want = centsByType.map { case (t, xs) =>
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      t -> ((xs.size.toLong, med / 100.0, mad / 100.0))
    }
    assert(got === want)
  }

  test("stat_mode_per_type equals the count-then-value replay") {
    val got = StatQueries.queries("stat_mode_per_type")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val want = centsByType.map { case (t, xs) =>
      val counts = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (mode, n) = counts.toSeq.minBy { case (v, c) => (-c, v) }
      t -> ((xs.size.toLong, counts.size.toLong, mode / 100.0, n))
    }
    assert(got === want)
  }

  test("stat_theil_sen averages BOTH middle slopes on an even pair count") {
    // 4 days -> C(4,2) = 6 pairs (EVEN): the pre-fix rank filter used
    // Column./ (true division), so rank (n+1)/2 = 3.5 matched nothing
    // and only the upper middle (2.5) was returned; the integer-div
    // spelling must average ranks 3 and 4 like the oracle's //
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("theil_even").toString
    // daily sums y = (0, 1, 5, 6) at consecutive days ->
    // sorted pairwise slopes (1, 1, 2, 2.5, 2.5, 4), median (2+2.5)/2
    val rows = Seq(0.0, 1.0, 5.0, 6.0).zipWithIndex.map { case (y, d) =>
      ((d + 1).toLong,
        java.sql.Timestamp.valueOf(f"2025-04-${d + 1}%02d 12:00:00"),
        1L, "click", y, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ProfileQueries.queries("stat_theil_sen")(spark, dir)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_pairs")) == 6L)
    assert(r.getDouble(r.fieldIndex("ts_slope")) == 2.25,
      s"even-count median must average ranks 3 and 4, got $r")
  }
}
