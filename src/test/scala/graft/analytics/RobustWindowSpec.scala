package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** window_hampel_outliers and stat_median_ci vs plain-Scala replays:
  * the Hampel census rebuilt from per-(user, type) sorted series with
  * textbook median/MAD windows, and the median CI rebuilt from full
  * sorted value arrays with the same rank formulas — both different
  * code paths from the engine's window/rank-probe plans.
  */
class RobustWindowSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def events() = graft.Tables.events(spark, sf)
    .select(col("user_id").cast("long"), col("event_type"),
      unix_timestamp(col("ts")).as("sec"), col("event_id").cast("long"),
      round(col("value") * 100, 0).cast("long").as("xc"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)))

  test("hampel census equals the sequential window replay") {
    val h = WindowQueries.HampelHalf
    val k = WindowQueries.HampelK
    val census = collection.mutable.Map
      .empty[String, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    for ((_, series) <- events().groupBy(e => (e._1, e._2))) {
      val xs = series.sortBy(e => (e._3, e._4)).map(_._5)
      for (i <- h until xs.length - h) {
        val win = xs.slice(i - h, i + h + 1).sorted
        val med = win(h)
        val mad = win.map(v => math.abs(v - med)).sorted.apply(h)
        val dev = math.abs(xs(i) - med)
        val out = if (dev > mad * k) 1L else 0L
        val t = series.head._2
        val (n, o, s) = census(t)
        census(t) = (n + 1L, o + out, s + (if (out == 1L) dev else 0L))
      }
    }
    val got = WindowQueries.queries("window_hampel_outliers")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val want = census.map { case (t, (n, o, s)) =>
      t -> (n, o, s.toDouble / 100.0) }.toMap
    assert(got == want, s"hampel differs:\n got $got\nwant $want")
    assert(got.values.map(_._2).sum > 0, "no outliers flagged at all")
  }

  test("median CI equals the sorted-array rank replay and brackets the median") {
    val byType = events().groupBy(_._2)
    val got = StatQueries.queries("stat_median_ci")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    for ((t, es) <- byType) {
      val xs = es.map(_._5).sorted
      val n = xs.length
      val rl = math.max(1L,
        math.floor((n - 1.96 * math.sqrt(n.toDouble)) / 2.0).toLong)
      val rm = (n + 1L) / 2L
      val ru = math.min(n.toLong,
        math.ceil((n + 1.96 * math.sqrt(n.toDouble)) / 2.0 + 1.0).toLong)
      val (gn, med, lo, hi) = got(t)
      assert(gn == n)
      assert(med == xs(rm.toInt - 1) / 100.0)
      assert(lo == xs(rl.toInt - 1) / 100.0)
      assert(hi == xs(ru.toInt - 1) / 100.0)
      assert(lo <= med && med <= hi)
    }
  }

  test("window_share_of_total: a zero-revenue region degrades to NULL share_ppm, not a divide abort") {
    // the path the degenerate sweeps miss: their single-row corpora
    // never make the orders→customer→nation→region chain JOIN, so
    // `rc div region_rc` never evaluates against a zero total. Build
    // a corpus where the chain hits and every price is zero cents.
    val dir = java.nio.file.Files
      .createTempDirectory("zero_region_rev").toString
    val src = "/root/testdata/sf0.001"
    def one(t: String) = spark.read.parquet(s"$src/$t.parquet").limit(1)
    one("region").withColumn("r_regionkey", lit(7).cast("int"))
      .coalesce(1).write.parquet(s"$dir/region.parquet")
    one("nation").withColumn("n_nationkey", lit(7).cast("int"))
      .withColumn("n_regionkey", lit(7).cast("int"))
      .coalesce(1).write.parquet(s"$dir/nation.parquet")
    one("customer").withColumn("c_custkey", lit(7L))
      .withColumn("c_nationkey", lit(7).cast("int"))
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    one("orders").withColumn("o_custkey", lit(7L))
      .withColumn("o_totalprice", lit(0.0))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = WindowQueries.queries("window_share_of_total")(spark, dir)
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getDouble(rows(0).fieldIndex("revenue")) === 0.0)
    assert(rows(0).isNullAt(rows(0).fieldIndex("share_ppm")),
      "zero region revenue must yield NULL share_ppm")
  }
}
