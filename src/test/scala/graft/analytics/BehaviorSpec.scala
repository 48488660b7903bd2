package graft.analytics

import graft.SparkSpec

/** Invariants of the behavioral suite on the sf0.001 testdata. */
class BehaviorSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("funnel stages are monotonically non-increasing") {
    val rows = BehaviorQueries.queries("funnel_stages")(spark, sf)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._2).toSeq == Seq("view", "click", "purchase"))
    val ns = rows.map(_._3)
    assert(ns(0) >= ns(1) && ns(1) >= ns(2),
      s"funnel must shrink stage over stage: ${ns.toSeq}")
    assert(ns(2) > 0, "fixture must contain full conversions")
  }

  test("cohort offset 0 contains every cohort member exactly once") {
    val rows = BehaviorQueries.queries("cohort_weekly_retention")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // offset 0 per cohort = the cohort's size; every later offset is <=
    val base = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    for ((cw, off, n) <- rows) {
      assert(off >= 0)
      assert(base.contains(cw), s"cohort $cw missing its offset-0 row")
      assert(n <= base(cw), s"cohort $cw offset $off: $n > base ${base(cw)}")
    }
  }

  test("correlations are one row per unordered type pair, inside [-1, 1]") {
    val rows = BehaviorQueries.queries("ts_type_correlation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val types = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    assert(rows.length == types.length * (types.length - 1) / 2,
      s"expected C(${types.length},2) pairs, got ${rows.length}")
    for ((ta, tb, nHours, p) <- rows) {
      assert(ta < tb, "pairs are unordered: ta < tb")
      assert(nHours > 0)
      p.foreach(v => assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9,
        s"$ta/$tb pearson $v out of range"))
    }
    // series here are non-constant, so no NULL correlations expected
    assert(rows.forall(_._4.isDefined))
  }

  test("transitions are ranked by count with deterministic tiebreak") {
    val rows = BehaviorQueries.queries("path_top_transitions")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    val byRank = rows.sortBy(_._1)
    assert(byRank.map(_._1).toSeq == (1L to byRank.length).toSeq)
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 &&
          (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3))))
      case _ =>
    }
  }
}
