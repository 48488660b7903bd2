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
}
