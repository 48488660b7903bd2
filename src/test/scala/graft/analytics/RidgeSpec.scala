package graft.analytics

import graft.SparkSpec

/** stat_ridge_path invariants: the λ = 0 row must reproduce
  * stat_linreg_multi bit-for-bit (ridge with no penalty IS OLS, and
  * both queries build the identical float tree from the same integer
  * moments), and shrinkage must be monotone — coefficient magnitudes
  * and the explained share can only decrease as λ grows.
  */
class RidgeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("lambda=0 reproduces OLS bit-for-bit and shrinkage is monotone") {
    val path = StatQueries.queries("stat_ridge_path")(spark, sf)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(path.map(_._1).toSeq == StatQueries.RidgeLambdas)
    val ols = StatQueries.queries("stat_linreg_multi")(spark, sf)
      .collect().head
    val (_, b0, bh, bw, fit) = path.head
    assert(b0 == ols.getDouble(1) && bh == ols.getDouble(2) &&
      bw == ols.getDouble(3) && fit == ols.getDouble(4),
      "lambda=0 row must equal stat_linreg_multi exactly")
    for (Seq((l1, _, h1, w1, f1), (l2, _, h2, w2, f2))
        <- path.toSeq.sliding(2)) {
      assert(l1 < l2)
      assert(math.abs(h2) <= math.abs(h1) + 1e-15,
        s"beta_hour grew from lambda $l1 to $l2")
      assert(math.abs(w2) <= math.abs(w1) + 1e-15,
        s"beta_weekend grew from lambda $l1 to $l2")
      assert(f2 <= f1 + 1e-15, s"fit_share grew from lambda $l1 to $l2")
    }
  }
}
