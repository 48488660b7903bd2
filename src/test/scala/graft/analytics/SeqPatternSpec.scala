package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** behavior_seq2_support vs an independent brute-force replay: the
  * query computes containment via one min/max key per (user, type);
  * the replay walks every user's full ordered event list and tests
  * every occurrence pair — a different algorithm, so agreement proves
  * the min/max reduction is exact (∃ a-event before b-event ⇔
  * min_key(a) < max_key(b)).
  */
class SeqPatternSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def result() = BehaviorQueries
    .queries("behavior_seq2_support")(spark, sf).collect()
    .map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n_users"), r.getAs[Long]("n_users_a"),
        r.getAs[Long]("support_ppm"), r.getAs[Long]("confidence_ppm")))
    .toMap

  private def rawEvents() = graft.Tables.events(spark, sf)
    .select(col("user_id").cast("long"), col("event_type"),
      unix_timestamp(col("ts")).as("sec"), col("event_id").cast("long"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("support equals the brute-force occurrence-pair scan") {
    val events = rawEvents()
    val byUser = events.groupBy(_._1)
    // brute force: for user u, pattern (a,b) holds iff some a-event's
    // (sec, event_id) sorts strictly before some b-event's
    val support = collection.mutable.Map.empty[(String, String), Long]
    for ((_, evs) <- byUser) {
      val keyed = evs.map(e => (e._2, (e._3, e._4)))
      val types = keyed.map(_._1).distinct
      for (a <- types; b <- types if a != b) {
        val aKeys = keyed.filter(_._1 == a).map(_._2)
        val bKeys = keyed.filter(_._1 == b).map(_._2)
        val hit = aKeys.exists(ak => bKeys.exists(bk =>
          ak._1 < bk._1 || (ak._1 == bk._1 && ak._2 < bk._2)))
        if (hit) support((a, b)) = support.getOrElse((a, b), 0L) + 1L
      }
    }
    val got = result()
    assert(got.keySet == support.keySet,
      s"pattern sets differ: ${got.keySet.diff(support.keySet)} vs ${
        support.keySet.diff(got.keySet)}")
    for ((p, (n, _, _, _)) <- got)
      assert(n == support(p), s"pattern $p: got $n want ${support(p)}")
  }

  test("ppm shares are consistent with the counts and totals") {
    val events = rawEvents()
    val nTotal = events.map(_._1).distinct.length.toLong
    val usersWith = events.map(e => (e._2, e._1)).distinct
      .groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    for (((a, _), (n, na, supPpm, confPpm)) <- result()) {
      assert(na == usersWith(a), s"$a: n_users_a $na != ${usersWith(a)}")
      assert(supPpm == n * 1000000L / nTotal)
      assert(confPpm == n * 1000000L / na)
      assert(n <= na && na <= nTotal)
    }
  }

  test("support is bounded by the audience co-occurrence") {
    val events = rawEvents()
    // users having at least one event of each type
    val usersByType = events.map(e => (e._2, e._1)).distinct
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val got = result()
    for (((a, b), (n, _, _, _)) <- got) {
      val both = (usersByType(a) & usersByType(b)).size.toLong
      assert(n <= both,
        s"pattern ($a,$b): support $n exceeds co-occurrence $both")
      // a strictly-ordered containment in one direction implies the
      // pair co-occurs, so the reverse pattern's audience is nonempty
      assert(both > 0)
    }
    assert(got.nonEmpty)
  }
}
