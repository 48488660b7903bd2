package graft.analytics

import graft.SparkSpec

/** The guard at its DEFAULT ceiling against data that would GENUINELY
  * overflow — MomentGuardSpec proves the raise machinery by shrinking
  * the ceiling; this spec proves the default threshold sits where
  * real overflow lives, in the three magnitude bands the 2^62 design
  * creates:
  *
  *  - ordinary magnitudes → clean pass;
  *  - the MARGIN band (bound in [2^62, 2^63), actual arithmetic still
  *    in range): the GUARD fires first, with the query name and the
  *    DECIMAL escape hatch — this is the factor-2 margin doing its
  *    job, failing actionably BEFORE any long multiply/sum can
  *    overflow;
  *  - far past the margin (per-row products or sums exceed 2^63):
  *    the failure is still LOUD — under ANSI (these sessions'
  *    default) Spark's ARITHMETIC_OVERFLOW may preempt the guard's
  *    projection mid-aggregate; under non-ANSI the guard itself
  *    catches the wrap (its bound is computed in DOUBLE from
  *    never-overflowing count/max) — silent wraparound is impossible
  *    either way.
  */
class MomentGuardOverflowSpec extends SparkSpec {

  /** events.parquet fixture: one row per (click, day) for 5 days,
    * `perDay` rows each, at the given value. */
  private def writeEvents(value: Double, perDay: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("guard_overflow").toString
    import spark.implicits._
    val rows = for (day <- 1 to 5; i <- 1 to perDay) yield
      ((day * 100 + i).toLong,
        java.sql.Timestamp.valueOf(f"2025-01-$day%02d 10:00:00"),
        i.toLong, "click", value, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("ordinary magnitudes pass at the default ceiling") {
    val sane = writeEvents(42.5, 20)
    for (q <- Seq("stat_zscore_daily", "stat_trend_daily"))
      assert(StatQueries.queries(q)(spark, sane).collect().nonEmpty, q)
  }

  test("margin band: the guard fires first, before arithmetic CAN overflow") {
    // one row per (type, day) at $2.5e7 → x = 2.5e9 cents;
    // zscore bound n²·max|x|² = 6.25e18 ∈ [2^62, 2^63) while every
    // long product/sum in the plan stays inside 2^63 — only the
    // guard can fail here, and it must
    val hot = writeEvents(2.5e7, 1)
    val e = intercept[Throwable] {
      StatQueries.queries("stat_zscore_daily")(spark, hot).collect()
    }
    val ms = messages(e)
    assert(ms.exists(m => m.contains("stat_zscore_daily") &&
        m.contains("headroom exceeded")),
      s"expected the guard's own message, got: ${ms.mkString(" | ")}")
    assert(ms.exists(_.contains("DECIMAL(38,0)")),
      "the margin-band failure must name the escape hatch")
  }

  test("far past the margin: loud failure, never a silent wrap") {
    // $5e9 → 5·10¹¹ cents: per-row x² ≈ 2.5·10²³ overflows the
    // multiply itself — ANSI throws mid-aggregate before the guard's
    // projection; silent wraparound must be impossible. (trend_daily
    // regresses daily COUNTS, not values, so it is immune to value
    // magnitude by construction — jackknife carries the value moments)
    val hot = writeEvents(5.0e9, 20)
    for (q <- Seq("stat_zscore_daily", "stat_jackknife")) {
      val e = intercept[Throwable] {
        StatQueries.queries(q)(spark, hot).collect()
      }
      val ms = messages(e)
      assert(ms.exists(m => m.contains("headroom exceeded") ||
          m.contains("ARITHMETIC_OVERFLOW") || m.contains("overflow")),
        s"$q: expected a loud overflow failure, got: ${ms.mkString(" | ")}")
    }
  }
}
