package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side textbook replays for the two round-8 exact-integer
  * aggregates: the grouped jackknife (pseudo-values rebuilt from raw
  * day sums with the same quantization) and the half-life decayed
  * revenue (per-order shift arithmetic in plain Scala).
  */
class JackknifeDecaySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("jackknife SE equals the sequential pseudo-value replay") {
    val days = graft.Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        round(col("value") * 100, 0).cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) =>
        (d, xs.length.toLong, xs.map(_._2).sum) }.toSeq
    val g = days.length.toLong
    val nn = days.map(_._2).sum
    val ss = days.map(_._3).sum
    val ms = days.map { case (_, nD, sD) =>
      math.floor((ss - sD).toDouble / (nn - nD).toDouble * 1000.0).toLong }
    val sm = ms.sum
    val sm2 = ms.map(m => m * m).sum
    val want = math.sqrt(((g - 1) * (g * sm2 - sm * sm)).toDouble) /
      g.toDouble / 1000.0 / 100.0
    val row = StatQueries.queries("stat_jackknife")(spark, sf)
      .collect().head
    assert(row.getLong(0) == g && row.getLong(1) == nn)
    assert(row.getDouble(2) == ss.toDouble / nn.toDouble / 100.0)
    assert(row.getDouble(3) == want, "SE differs from replay")
    // jackknife SE of a mean over ~independent days must be positive
    // and far below the mean itself on this fixture
    assert(want > 0 && want < row.getDouble(2))
  }

  test("decayed revenue equals the per-order shift replay") {
    val orders = graft.Tables.orders(spark, sf)
      .select(col("o_custkey").cast("long"),
        unix_timestamp(col("o_orderdate")).as("osec"),
        round(col("o_totalprice") * 100, 0).cast("long").as("pc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val segs = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val amax = orders.map(_._2).max
    val want = orders.groupBy(o => segs(o._1)).map { case (seg, os) =>
      val dec = os.map { case (_, osec, pc) =>
        val k = math.min(
          (amax - osec) / (InsightQueries.HalfLifeDays * 86400L),
          InsightQueries.MaxDecayShift)
        pc / (1L << k.toInt)
      }.sum
      seg -> (os.length.toLong, os.map(_._3).sum / 100.0, dec / 100.0)
    }
    val got = InsightQueries.queries("agg_decayed_revenue")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == want, s"decay differs:\n got $got\nwant $want")
    // decay can only shrink revenue, and must shrink it strictly for
    // any order older than one half-life
    for ((seg, (_, rev, dec)) <- got) {
      assert(dec <= rev, s"$seg: decayed $dec exceeds raw $rev")
    }
  }
}
