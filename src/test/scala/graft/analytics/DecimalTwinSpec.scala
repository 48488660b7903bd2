package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The round-13 DECIMAL(38,0) fallback twins (VERDICT r12 task 6):
  * the tightest guards on the headroom ledger get live escape
  * hatches, each pinned the PcaPowerSpec way — bit-identical rows and
  * an unchanged distributed plan shape, so the swap the guard message
  * prescribes changes ONLY the moments' storage type.
  *
  * Three of the four earned their twins empirically: the round-13
  * scaling-curve run tripped the BIGINT guards of
  * graph_assortativity ((M·Dmax)² ≈ 5.3·10¹⁸), stat_corr_monthly
  * (slice n²·max² ≈ 5.9·10¹⁸), and window_share_of_total
  * (region_rc·10⁶ ≈ 7.4·10¹⁸) at a mere ×10 amplification of sf0.1,
  * and the decimal spellings complete on that same corpus
  * (BENCH_NOTES r13). sim_centroid_drift carries the ledger's
  * tightest analytic bound (~10⁵ vectors per label).
  */
class DecimalTwinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def shapeSession = {
    val s2 = spark.newSession()
    // AQE off while shapes are taken — AdaptiveSparkPlanExec is a
    // leaf, so under AQE collect() sees neither exchanges nor
    // aggregates and the comparison would be vacuous (PcaPowerSpec
    // precedent); cloned session so the toggle can't race suites
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2
  }

  private def shape(df: DataFrame): (Int, Int) = {
    val p = df.queryExecution.executedPlan
    (p.collect { case e: org.apache.spark.sql.execution.exchange
        .ShuffleExchangeExec => e }.size,
      p.collect { case a: org.apache.spark.sql.execution.aggregate
        .BaseAggregateExec => a }.size)
  }

  private def pinTwin(base: String,
      queries: Map[String, (org.apache.spark.sql.SparkSession, String)
        => DataFrame]): Unit = {
    val a = queries(base)(spark, sf).collect()
    val b = queries(s"${base}_decimal")(spark, sf).collect()
    assert(a.nonEmpty, s"$base: empty fixture result — vacuous")
    assert(a.length == b.length, s"$base: row counts differ")
    for ((ra, rb) <- a.zip(b); i <- 0 until ra.length)
      assert(ra.get(i) == rb.get(i) ||
          (ra.isNullAt(i) && rb.isNullAt(i)),
        s"$base col $i not identical across the DECIMAL swap: " +
          s"${ra.get(i)} vs ${rb.get(i)}")
    val s2 = shapeSession
    val sb = shape(queries(base)(s2, sf))
    val sd = shape(queries(s"${base}_decimal")(s2, sf))
    assert(sb._1 > 0 && sb._2 > 0,
      s"$base shape probe saw no exchange/aggregate nodes ($sb)")
    assert(sb == sd, s"$base plan shape drifted: $sb vs $sd")
  }

  test("graph_assortativity_decimal: bit-identical, same plan shape") {
    pinTwin("graph_assortativity", GraphQueries.queries)
  }

  test("sim_centroid_drift_decimal: bit-identical, same plan shape") {
    pinTwin("sim_centroid_drift", graft.llm.SimilarityQueries.queries)
  }

  test("stat_corr_monthly_decimal: bit-identical, same plan shape") {
    pinTwin("stat_corr_monthly", StatQueries.queries)
  }

  test("window_share_of_total_decimal: bit-identical, same plan shape") {
    pinTwin("window_share_of_total", WindowQueries.queries)
  }
}
