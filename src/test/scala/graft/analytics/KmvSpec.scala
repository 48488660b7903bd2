package graft.analytics

import graft.SparkSpec

/** Driver-side replay of the KMV sketch family: the kth-minimum, the
  * estimator branches, and the lossless-merge property, recomputed
  * literally from collected hashes (Spark's own xxhash64 — the DuckDB
  * oracle already re-derives THAT independently via XxhSql).
  */
class KmvSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val K = 64

  private def hashes: Map[String, Set[Long]] =
    graft.Tables.events(spark, sf)
      .selectExpr("event_type",
        "xxhash64(CAST(user_id AS STRING)) & 9223372036854775807 AS uh")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def est(n: Long, kth: Option[Long]): Double =
    if (n < K) n.toDouble
    else (K - 1).toDouble * 9223372036854775808.0 / kth.get.toDouble

  test("per-type kth-min and estimate match a literal replay") {
    val got = KmvQueries.queries("sketch_kmv_users")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getDouble(3)))).toMap
    val want = hashes.map { case (t, hs) =>
      val sorted = hs.toSeq.sorted
      val kth = if (hs.size >= K) Some(sorted(K - 1)) else None
      t -> ((hs.size.toLong, kth, est(hs.size.toLong, kth)))
    }
    assert(got === want)
  }

  test("merged sketch equals direct sketch (lossless KMV merge)") {
    val r = KmvQueries.queries("sketch_kmv_merge")(spark, sf).collect()(0)
    // columns: k, merged_kth, direct_kth, merged_est, direct_est, exact
    assert(r.isNullAt(1) === r.isNullAt(2))
    if (!r.isNullAt(1)) assert(r.getLong(1) === r.getLong(2))
    assert(r.getDouble(3) === r.getDouble(4))
    // replay the direct global sketch
    val global = hashes.values.flatten.toSet
    val kth = if (global.size >= K) Some(global.toSeq.sorted.apply(K - 1))
      else None
    assert(r.getDouble(4) === est(global.size.toLong, kth))
  }

  test("theta intersection counts candidates below the min threshold") {
    val r = KmvQueries.queries("sketch_kmv_overlap")(spark, sf).collect()(0)
    val a = hashes.getOrElse("view", Set.empty)
    val b = hashes.getOrElse("purchase", Set.empty)
    def sketch(s: Set[Long]) = s.toSeq.sorted.take(K).toSet
    def theta(s: Set[Long]) =
      if (s.size >= K) s.toSeq.sorted.apply(K - 1) else Long.MaxValue
    val t = math.min(theta(a), theta(b))
    val ca = sketch(a).filter(_ < t)
    val cb = sketch(b).filter(_ < t)
    assert(r.getLong(0) === ca.intersect(cb).size.toLong)
    assert(r.getLong(1) === ca.union(cb).size.toLong)
    assert(r.getLong(2) === t)
  }
}
