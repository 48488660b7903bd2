package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** stat_mann_kendall vs a sequential textbook replay (the PcaPowerSpec
  * pattern): S, the tie-corrected variance and z are recomputed in
  * plain Scala with the SAME IEEE tree — bit-for-bit agreement on the
  * real sf0.001 series proves the distributed aggregates equal the
  * sequential definition. Planted fixtures then pin every verdict and
  * degenerate path: monotone up (increasing), monotone down
  * (decreasing), all-tied (vnum = 0 → NULL z), single-day (no pairs →
  * S = 0, NULL z), and an alternating flat series (no_trend).
  */
class MannKendallSpec extends SparkSpec {

  /** (n_days, s, z, trend) from a day→count series, sequentially. */
  private def replay(ys: Seq[Long])
      : (Long, Long, Option[Double], Option[String]) = {
    val n = ys.size.toLong
    var s = 0L
    for (i <- ys.indices; j <- (i + 1) until ys.size)
      s += java.lang.Long.signum(ys(j) - ys(i)).toLong
    val tcorr = ys.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val vnum = n * (n - 1) * (2 * n + 5) - tcorr
    if (vnum == 0L) (n, s, None, None)
    else {
      val z = (s - java.lang.Long.signum(s)).toDouble /
        math.sqrt(vnum.toDouble / 18.0)
      val trend = if (z > 1.96) "increasing"
        else if (z < -1.96) "decreasing" else "no_trend"
      (n, s, Some(z), Some(trend))
    }
  }

  private def collectQuery(dir: String)
      : Map[String, (Long, Long, Option[Double], Option[String])] =
    StatQueries.queries("stat_mann_kendall")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)))).toMap

  test("bit-exact sequential replay on the real sf0.001 series") {
    val sf = "/root/testdata/sf0.001"
    // the (type, day, count) table through the SAME helper the query
    // uses (the shared contract, oracle-verified); day ORDER is the
    // only thing the replay needs beyond the multiset of counts
    val daily = StatQueries.dailyCounts(spark, sf)
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.toString).map(_._3).toSeq).toMap
    val got = collectQuery(sf)
    assert(got.keySet == daily.keySet)
    for ((t, ys) <- daily) {
      val want = replay(ys)
      assert(got(t) == want, s"type $t: got ${got(t)} want $want")
    }
    assert(daily.exists(_._2.size > 1), "fixture degenerate")
  }

  test("planted fixtures: every verdict and degenerate path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mk_fix").toString
    // counts per (type, day index 1..10): up i, down 11−i, flat 3,
    // wobble 3/4 alternating; solo exists on day 1 only
    val rows = for {
      day <- 1 to 10
      (tpe, c) <- Seq("up" -> day, "down" -> (11 - day), "flat" -> 3,
        "wob" -> (3 + day % 2)) ++
        (if (day == 1) Seq("solo" -> 1) else Nil)
      i <- 1 to c
    } yield ((day * 1000 + i).toLong,
      java.sql.Timestamp.valueOf(f"2025-03-$day%02d 09:00:00"),
      i.toLong, tpe, 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = collectQuery(dir)
    for (t <- Seq("up", "down", "flat", "wob", "solo"))
      assert(got(t) == replay(t match {
        case "up" => (1 to 10).map(_.toLong)
        case "down" => (1 to 10).map(d => (11 - d).toLong)
        case "flat" => Seq.fill(10)(3L)
        case "wob" => (1 to 10).map(d => (3 + d % 2).toLong)
        case _ => Seq(1L)
      }), s"type $t mismatch")
    // and the verdicts are the ones the fixture was built to force
    assert(got("up")._4.contains("increasing"))
    assert(got("down")._4.contains("decreasing"))
    assert(got("wob")._4.contains("no_trend"))
    assert(got("flat")._3.isEmpty && got("flat")._2 == 0L) // all tied
    assert(got("solo") == ((1L, 0L, None, None))) // no pairs
  }
}
