package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** curation_pareto_skyline vs a plain-Scala O(n²) dominance scan on
  * the raw text (metrics recomputed independently with String.split),
  * plus a planted fixture with duplicate-metric frontier docs and a
  * strictly dominated block — the tie and prune cases the sf fixture
  * may not exercise.
  */
class SkylineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def metrics(text: String): (Long, Long, Long) = {
    val ws = text.split(" ", -1)
    val byW = ws.groupBy(identity).map { case (_, g) => g.length.toLong }
    (ws.length.toLong, byW.size.toLong, byW.max)
  }

  private def bruteSkyline(ms: Seq[(Long, (Long, Long, Long))])
      : Set[Long] =
    ms.filterNot { case (_, (w, v, r)) =>
      ms.exists { case (_, (w2, v2, r2)) =>
        w2 >= w && v2 >= v && r2 <= r &&
          (w2 > w || v2 > v || r2 < r) }
    }.map(_._1).toSet

  test("skyline equals the quadratic dominance scan on sf0.001") {
    val ms = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> metrics(r.getString(1))).toSeq
    val want = bruteSkyline(ms)
    val got = CurationQueries.queries("curation_pareto_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.map(_._1).toSet == want,
      s"skyline sets differ: got ${got.map(_._1).toSet} want $want")
    // reported metrics must match the independent recomputation
    val byId = ms.toMap
    got.foreach { case (id, m) => assert(m == byId(id), s"doc $id") }
  }

  test("planted ties survive together and dominated blocks prune") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sky").toString
    // docs 1,2: identical metrics (w=8, v=8, tf=1) — the minimal-
    // repetition frontier point, tied: BOTH must stay (dominance is
    // strict-somewhere, equals never dominate). doc 3: longer and
    // richer but with a repeat (w=17, v=16, tf=2) — incomparable to
    // 1/2, also frontier. docs 10..29: strictly dominated by every
    // frontier doc (fewer words, less vocab, more repetition).
    val frontier = Seq(
      (1L, "a b c d e f g h"), (2L, "h g f e d c b a"),
      (3L, "a a b c d e f g h i j k l m n o p"))
    val dominated = (10L to 29L).map(i => (i, "a a a a"))
    (frontier ++ dominated).map { case (id, t) =>
      (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3).write.parquet(s"$dir/documents.parquet")
    val got = CurationQueries
      .queries("curation_pareto_skyline")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val ms = (frontier ++ dominated)
      .map { case (id, t) => id -> metrics(t) }
    assert(got == bruteSkyline(ms))
    assert(got == Set(1L, 2L, 3L))
  }
}
