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
