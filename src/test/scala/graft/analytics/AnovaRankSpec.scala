package graft.analytics

import graft.SparkSpec

/** Independent derivations of the session's parametric/rank statistics
  * — textbook formulas on collected rows (sorted-scan ranks, pairwise
  * AUC, naive 2×2 OLS), third implementations beside the distributed
  * plan and the DuckDB oracle. Tolerances cover only the documented
  * floor-quantization of rational per-group terms (< 1 unit per group
  * on 10¹⁰-scale sums).
  */
class AnovaRankSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rel(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(1e-12, math.max(math.abs(a), math.abs(b)))

  private lazy val centsByType: Map[String, Seq[Long]] =
    graft.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS xc")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("stat_anova_oneway matches the textbook F on collected values") {
    val r = ProfileQueries.queries("stat_anova_oneway")(spark, sf)
      .collect().head
    val groups = centsByType.values.toSeq
    val n = groups.map(_.size).sum.toDouble
    val k = groups.size.toDouble
    val grand = groups.flatten.map(_.toDouble).sum
    val ssb = groups.map(g => math.pow(g.map(_.toDouble).sum, 2) / g.size)
      .sum - grand * grand / n
    val ssTot = groups.flatten.map(x => x.toDouble * x.toDouble).sum -
      grand * grand / n
    val ssw = ssTot - ssb
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(r.getAs[Long]("k_groups") === groups.size)
    // k+1 floor-quantized terms bound the SS error at ~6 absolute
    // units on ~1e8-scale sums -> loose 1e-6 relative bound
    assert(rel(r.getAs[Long]("ss_between_c2").toDouble, ssb) < 1e-6)
    assert(rel(r.getAs[Long]("ss_within_c2").toDouble, ssw) < 1e-6)
    assert(rel(r.getAs[Double]("f_stat"), f) < 1e-5)
  }

  test("stat_kruskal_wallis matches sorted-scan midranks") {
    val r = ProfileQueries.queries("stat_kruskal_wallis")(spark, sf)
      .collect().head
    val all = centsByType.toSeq.flatMap { case (t, xs) => xs.map((t, _)) }
    val n = all.size.toDouble
    // midrank of value v = (#below) + (#tied + 1) / 2
    val byValue = all.groupBy(_._2).view.mapValues(_.size).toMap
    val sortedVals = byValue.keys.toSeq.sorted
    val below = sortedVals.zip(
      sortedVals.scanLeft(0L)((acc, v) => acc + byValue(v)).dropRight(1))
      .toMap
    def midrank(v: Long): Double = below(v) + (byValue(v) + 1) / 2.0
    val h = 12.0 / (n * (n + 1)) * centsByType.values.map { xs =>
      math.pow(xs.map(midrank).sum, 2) / xs.size
    }.sum - 3 * (n + 1)
    val ties = byValue.values.map(t => t.toDouble * t * t - t).sum
    val corr = 1.0 - ties / (n * n * n - n)
    assert(r.getAs[Long]("n") === all.size)
    // H is a small difference of two ~3(N+1)-magnitude terms, so the
    // k floor-quantized rank terms surface as ~12k/N^2 ABSOLUTE error
    assert(math.abs(r.getAs[Double]("h_stat") - h) < 1e-3)
    assert(rel(r.getAs[Double]("tie_corr"), corr) < 1e-9)
    assert(math.abs(r.getAs[Double]("h_corrected") - h / corr) < 1e-3)
  }

  test("stat_tukey_hsd matches the textbook Tukey-Kramer q on collected values") {
    val rows = ProfileQueries.queries("stat_tukey_hsd")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(4), r.getDouble(5)))).toMap
    val groups = centsByType
    val n = groups.values.map(_.size).sum.toDouble
    val k = groups.size.toDouble
    val ssw = groups.values.map { g =>
      val m = g.map(_.toDouble).sum / g.size
      g.map(x => (x - m) * (x - m)).sum
    }.sum
    val msw = ssw / (n - k)
    for (a <- groups.keys; b <- groups.keys if a < b) {
      val (ga, gb) = (groups(a), groups(b))
      val md = math.abs(ga.map(_.toDouble).sum / ga.size -
        gb.map(_.toDouble).sum / gb.size)
      val q = md / math.sqrt(msw / 2 * (1.0 / ga.size + 1.0 / gb.size))
      val (gotMd, gotQ) = rows((a, b))
      assert(rel(gotMd, md / 100.0) < 1e-9)
      assert(rel(gotQ, q) < 1e-5) // msw carries the quantized SSW
    }
  }

  test("stat_dunn_test matches sorted-scan mean ranks and z") {
    val rows = ProfileQueries.queries("stat_dunn_test")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val all = centsByType.toSeq.flatMap { case (t, xs) => xs.map((t, _)) }
    val n = all.size.toDouble
    val byValue = all.groupBy(_._2).view.mapValues(_.size).toMap
    val sortedVals = byValue.keys.toSeq.sorted
    val below = sortedVals.zip(
      sortedVals.scanLeft(0L)((acc, v) => acc + byValue(v)).dropRight(1))
      .toMap
    def midrank(v: Long): Double = below(v) + (byValue(v) + 1) / 2.0
    val meanRank = centsByType.view
      .mapValues(xs => xs.map(midrank).sum / xs.size).toMap
    val ties = byValue.values.map(t => t.toDouble * t * t - t).sum
    val vterm = n * (n + 1) / 12.0 - ties / (12.0 * (n - 1))
    for (a <- centsByType.keys; b <- centsByType.keys if a < b) {
      val (na, nb) = (centsByType(a).size, centsByType(b).size)
      val z = math.abs(meanRank(a) - meanRank(b)) /
        math.sqrt(vterm * (1.0 / na + 1.0 / nb))
      val (gotA, gotB, gotZ) = rows((a, b))
      assert(rel(gotA, meanRank(a)) < 1e-9)
      assert(rel(gotB, meanRank(b)) < 1e-9)
      assert(rel(gotZ, z) < 1e-9)
    }
  }

  test("stat_auc_roc equals pairwise-comparison AUC") {
    val r = InsightQueries.queries("stat_auc_roc")(spark, sf)
      .collect().head
    val pos = centsByType("purchase")
    val neg = (centsByType - "purchase").values.flatten.toSeq
    val wins = (for (p <- pos; q <- neg) yield
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val auc = wins / (pos.size.toDouble * neg.size)
    assert(r.getAs[Long]("n_pos") === pos.size)
    assert(r.getAs[Long]("n_neg") === neg.size)
    assert(rel(r.getAs[Double]("auc"), auc) < 1e-9)
    assert(rel(r.getAs[Double]("gini"), 2 * auc - 1) < 1e-9)
  }

  test("stat_linreg_multi matches the naive 2x2 normal-equation solve") {
    val r = StatQueries.queries("stat_linreg_multi")(spark, sf)
      .collect().head
    val rows = graft.Tables.events(spark, sf).selectExpr(
      "CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT) % 24 AS x1",
      "CAST((CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT) + 4) % 7" +
        " IN (0, 6) AS INT) AS x2",
      "CAST(round(value) AS BIGINT) AS y")
      .collect().map(x => (x.getLong(0).toDouble,
        x.getInt(1).toDouble, x.getLong(2).toDouble))
    val n = rows.size.toDouble
    def mean(f: ((Double, Double, Double)) => Double) = rows.map(f).sum / n
    val (m1, m2, my) = (mean(_._1), mean(_._2), mean(_._3))
    def cov(f: ((Double, Double, Double)) => Double, mf: Double,
        g: ((Double, Double, Double)) => Double, mg: Double) =
      rows.map(t => (f(t) - mf) * (g(t) - mg)).sum
    val (s11, s22, s12) = (cov(_._1, m1, _._1, m1),
      cov(_._2, m2, _._2, m2), cov(_._1, m1, _._2, m2))
    val (s1y, s2y, syy) = (cov(_._1, m1, _._3, my),
      cov(_._2, m2, _._3, my), cov(_._3, my, _._3, my))
    val det = s11 * s22 - s12 * s12
    val b1 = (s22 * s1y - s12 * s2y) / det
    val b2 = (s11 * s2y - s12 * s1y) / det
    val b0 = my - b1 * m1 - b2 * m2
    assert(rel(r.getAs[Double]("beta_hour"), b1) < 1e-6)
    assert(rel(r.getAs[Double]("beta_weekend"), b2) < 1e-6)
    assert(rel(r.getAs[Double]("beta0"), b0) < 1e-6)
    assert(rel(r.getAs[Double]("r2"), (b1 * s1y + b2 * s2y) / syy) < 1e-6)
  }

  test("text_langid_kappa recomputes from the confusion matrix") {
    val cm = graft.llm.TextQueries.queries("text_lang_confusion")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val r = graft.llm.TextQueries.queries("text_langid_kappa")(spark, sf)
      .collect().head
    val n = cm.map(_._2).sum
    val diag = cm.collect { case ((a, b), c) if a == b => c }.sum
    val rowT = cm.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val colT = cm.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val p = rowT.keySet.intersect(colT.keySet).toSeq
      .map(k => rowT(k) * colT(k)).sum
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("diag") === diag)
    assert(r.getAs[Long]("chance_prod") === p)
    assert(r.getAs[Double]("kappa") ===
      (n.toDouble * diag - p) / (n.toDouble * n - p))
  }
}
