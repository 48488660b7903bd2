package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the exact-statistics suite beyond the driver hash:
  * algebraic identities of the integer-moments spelling, and a
  * brute-force replay of the banded temporal self-join.
  */
class StatSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("z-scores sum to ~0 within every cohort (numerators cancel exactly)") {
    val rows = StatQueries.queries("stat_zscore_daily")(spark, sf)
      .groupBy("event_type", "day").agg(sum("z").as("sz"), count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(math.abs(r.getAs[Double]("sz")) < 1e-9,
        s"cohort ${r.get(0)}/${r.get(1)} z-sum ${r.getAs[Double]("sz")}")
  }

  test("correlations live in [-1, 1]; some slice is non-degenerate") {
    val rows = StatQueries.queries("stat_corr_monthly")(spark, sf).collect()
    val vals = rows.flatMap(r => Option(r.getAs[java.lang.Double]("corr_qty_price")))
    assert(vals.nonEmpty, "every slice degenerate — vacuous fixture")
    for (v <- vals) assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"corr $v")
  }

  test("winsorized mean sits inside [p05, p95] and p05 <= p95") {
    val rows = StatQueries.queries("agg_winsorized_mean")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (lo, hi, m) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"),
        r.getAs[Double]("wmean"))
      assert(lo <= hi && m >= lo && m <= hi, s"${r.get(0)}: $lo $m $hi")
    }
  }

  test("banded pair bursts equal the brute-force within-user scan") {
    // sf0.01: the 30-s window finds no pairs in the sparser sf0.001
    // fixture, and a vacuous equality would prove nothing
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("tsec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val brute = e.groupBy(_._1).flatMap { case (u, es) =>
      val pairs = for {
        x <- es; y <- es
        if x._2 < y._2 && math.abs(x._4 - y._4) <= 30 && x._3 != y._3
      } yield math.abs(x._4 - y._4)
      if (pairs.isEmpty) None
      else Some(u -> (pairs.size.toLong, pairs.min))
    }.toMap
    val got = StatQueries.queries("behavior_pair_bursts")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == brute)
    assert(brute.nonEmpty, "no pairs at all — vacuous fixture")
  }
}
