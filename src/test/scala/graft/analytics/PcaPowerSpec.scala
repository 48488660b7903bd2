package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** stat_pca_power vs a plain-Scala replay: the quantized features are
  * pulled through the same Spark projection (quantization is the
  * shared contract, verified against DuckDB by the oracle gate), then
  * the moments, covariance and all [[StatQueries.PcaRounds]] power-
  * iteration rounds are recomputed sequentially with the same
  * left-associated IEEE trees — bit-for-bit agreement proves the
  * one-pass distributed moments plus the 1-row float DAG equal the
  * sequential definition. Plus structural invariants: unit-norm
  * eigenvector, positive eigenvalue bounded by the trace.
  */
class PcaPowerSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("eigenpair equals the sequential replay bit-for-bit") {
    val feats = graft.Tables.lineitem(spark, sf).select(
      round(col("l_quantity"), 0).cast("long"),
      round(col("l_extendedprice"), 0).cast("long"),
      round(col("l_discount") * 100, 0).cast("long"),
      round(col("l_tax") * 100, 0).cast("long"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val n = feats.length.toLong
    val s = Array.tabulate(4)(j => feats.map(_(j)).sum)
    val sq = Array.tabulate(4, 4) { (j, k) =>
      feats.map(r => r(j) * r(k)).sum }
    val nD = n.toDouble
    val c = Array.tabulate(4, 4) { (j, k) =>
      (nD * sq(j)(k).toDouble - s(j).toDouble * s(k).toDouble) /
        (nD * nD) }
    var v = Array.fill(4)(0.5)
    var nrm = 0.0
    for (_ <- 1 to StatQueries.PcaRounds) {
      val w = Array.tabulate(4)(j =>
        (0 until 4).map(k => c(j)(k) * v(k)).reduceLeft(_ + _))
      nrm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
      v = w.map(_ / nrm)
    }
    val row = StatQueries.queries("stat_pca_power")(spark, sf)
      .collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == nrm, "lambda differs from replay")
    for (j <- 0 until 4)
      assert(row.getDouble(2 + j) == v(j), s"v($j) differs from replay")
    // structural invariants
    val norm2 = v.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-12, "eigenvector not unit norm")
    val trace = (0 until 4).map(j => c(j)(j)).sum
    assert(nrm > 0.0 && nrm <= trace * (1 + 1e-12),
      "eigenvalue outside (0, trace]")
    // price variance dominates this table by orders of magnitude, so
    // the top direction must be essentially the price axis
    assert(math.abs(v(1)) > 0.99, s"price loading ${v(1)} not dominant")
  }

  test("DECIMAL(38,0) twin: bit-identical result, same plan shape") {
    // the escape hatch every momentGuard message names — the swap
    // must change ONLY the moments' storage type, not the answer or
    // the distributed shape of the plan
    val bigint = StatQueries.queries("stat_pca_power")(spark, sf)
    val dec = StatQueries.queries("stat_pca_power_decimal")(spark, sf)
    val a = bigint.collect().head
    val b = dec.collect().head
    assert(a.getLong(0) == b.getLong(0))
    for (i <- 1 to 5)
      assert(a.getDouble(i) == b.getDouble(i),
        s"col $i not bit-identical across the DECIMAL swap")
    // plan shape: same exchanges (one partial→final aggregate pair,
    // no extra shuffle), same aggregate node count. AQE must be OFF
    // while the shapes are taken — AdaptiveSparkPlanExec is a leaf,
    // so under AQE collect() sees neither exchanges nor aggregates
    // and the comparison would be vacuously (0,0)==(0,0)
    // (PlanShapeSpec/ShuffleVolumeSpec precedent). Toggle AQE on a
    // CLONED session (isolated SQLConf, shared context) — mutating the
    // shared session's conf is the cross-suite race MomentGuardSpec
    // avoids the same way.
    val shapeSession = spark.newSession()
    shapeSession.conf.set("spark.sql.adaptive.enabled", "false")
    def shape(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val p = df.queryExecution.executedPlan
      (p.collect { case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e }.size,
        p.collect { case a: org.apache.spark.sql.execution.aggregate
          .BaseAggregateExec => a }.size)
    }
    val sb = shape(StatQueries.queries("stat_pca_power")(shapeSession, sf))
    val sd = shape(
      StatQueries.queries("stat_pca_power_decimal")(shapeSession, sf))
    assert(sb._1 > 0 && sb._2 > 0,
      s"shape probe saw no exchange/aggregate nodes ($sb) — vacuous")
    assert(sb == sd, s"plan shape drifted: $sb vs $sd")
  }
}
