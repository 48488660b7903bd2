package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** behavior_pattern_regex vs a driver-side replay: per-user symbol
  * strings rebuilt independently (Scala sort + StringBuilder) and
  * counted with java.util.regex non-overlapping find() — verifying
  * the collect_list/sort_array/slice string construction and the
  * census aggregation. Pattern uniqueness (the engine-agnosticism
  * claim) is additionally pinned on adversarial literal strings.
  */
class PatternRegexSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("pattern census equals the sequential replay") {
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id").cast("long"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"), col("event_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val seqs = events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._3, e._4))
        .take(BehaviorQueries.MaxSeqEvents)
        .map(_._2.head).mkString
    }
    val want = BehaviorQueries.PatternRegexes.map { case (name, rx) =>
      val p = java.util.regex.Pattern.compile(rx)
      val counts = seqs.values.map { sq =>
        val m = p.matcher(sq)
        var c = 0L
        while (m.find()) c += 1
        c
      }
      name -> (counts.count(_ > 0).toLong, counts.sum)
    }.toMap
    val got = BehaviorQueries
      .queries("behavior_pattern_regex")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_matches"))).toMap
    assert(got == want, s"census differs:\n got $got\nwant $want")
    assert(got.values.exists(_._2 > 0L), "no pattern matched at all")
  }

  test("patterns have unique match sets on adversarial strings") {
    // hand-checked counts: the negated-class gap cannot cross its
    // terminator and e+ cannot skip a p, so greedy (Java) and RE2
    // leftmost semantics must coincide
    val cases = Seq(
      ("vcpcvp", Map("browse_to_buy" -> 2L)), // v..p then cv→p
      ("vvp", Map("browse_to_buy" -> 1L)), // inner v swallowed by gap
      ("eepeep", Map("error_then_purchase" -> 2L)),
      ("ssss", Map("double_signup" -> 2L)), // non-overlapping pairs
      ("sss", Map("double_signup" -> 1L)))
    for ((sq, exp) <- cases;
         (name, rx) <- BehaviorQueries.PatternRegexes
         if exp.contains(name)) {
      val m = java.util.regex.Pattern.compile(rx).matcher(sq)
      var c = 0L
      while (m.find()) c += 1
      assert(c == exp(name),
        s"pattern $name on '$sq': got $c want ${exp(name)}")
    }
  }
}
