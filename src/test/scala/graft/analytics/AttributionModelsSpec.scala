package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** behavior_attribution_models vs a sequential replay of all four
  * credit models from the raw purchase/click tables (naive window
  * scan, same integer arithmetic), plus the conservation invariant:
  * a purchase's credits sum to exactly 10⁶ ppm for last-touch and to
  * 10⁶ minus the documented floor-division remainders for the rest.
  */
class AttributionModelsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val W = BehaviorQueries.AttribWindowSec

  test("credit census equals the sequential replay; credits conserve") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id").cast("long"), col("event_type"),
        col("event_id").cast("long"), unix_timestamp(col("ts")).as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val purch = ev.filter(_._2 == "purchase")
    val clicks = ev.filter(_._2 == "click").groupBy(_._1)
    val census = collection.mutable.Map
      .empty[(String, Long), (Long, Long)].withDefaultValue((0L, 0L))
    for ((u, pid, pt) <- purch.map(p => (p._1, p._3, p._4))) {
      val ts = clicks.getOrElse(u, Array.empty)
        .filter(c => c._4 > pt - W && c._4 <= pt)
        .sortBy(c => (c._4, c._3))
      val k = ts.length.toLong
      if (k > 0) {
        val dws = ts.map(c => 8L >> ((pt - c._4) / 900L).toInt)
        val sw = dws.sum
        var conserved = Map("last_touch" -> 0L, "linear" -> 0L,
          "time_decay" -> 0L, "u_shaped" -> 0L)
        for (((c, dw), idx) <- ts.zip(dws).zipWithIndex) {
          val i = idx + 1L
          val hod = c._4 / 3600L % 24L
          val credits = Seq(
            "last_touch" -> (if (i == k) 1000000L else 0L),
            "linear" -> 1000000L / k,
            "time_decay" -> dw * 1000000L / sw,
            "u_shaped" -> (if (k == 1) 1000000L else if (k == 2) 500000L
              else if (i == 1 || i == k) 400000L else 200000L / (k - 2)))
          for ((m, cr) <- credits) {
            val (n, s) = census((m, hod))
            census((m, hod)) = (n + 1L, s + cr)
            conserved = conserved.updated(m, conserved(m) + cr)
          }
        }
        // conservation: exact for last-touch; floor losses < k ppm
        // (linear/decay) and < k + 200k-split remainders (u-shaped)
        assert(conserved("last_touch") == 1000000L)
        assert(conserved("linear") > 1000000L - k &&
          conserved("linear") <= 1000000L)
        assert(conserved("time_decay") > 1000000L - k &&
          conserved("time_decay") <= 1000000L)
        assert(conserved("u_shaped") > 1000000L - k &&
          conserved("u_shaped") <= 1000000L)
      }
    }
    val got = BehaviorQueries
      .queries("behavior_attribution_models")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("credit_ppm"))).toMap
    assert(got == census.toMap,
      s"census differs: ${got.toSet.diff(census.toSet)} / ${
        census.toSet.diff(got.toSet)}")
  }
}
