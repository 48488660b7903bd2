package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content invariants for the mining suite: the PII plant is found
  * and removed, and the Heaps curve closes on the true corpus totals.
  */
class MiningSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every planted contact line is scrubbed; clean docs untouched") {
    val rows = MiningQueries.queries("text_pii_scrub")(spark, sf).collect()
    val planted = rows.filter(_.getLong(0) % 7 == 0)
    assert(planted.nonEmpty)
    for (r <- planted) {
      assert(r.getAs[Long]("n_emails") >= 1L, s"doc ${r.getLong(0)}: email missed")
      assert(r.getAs[Long]("n_ids") >= 0L)
    }
    // docs without a plant and without natural PII lose zero chars
    val clean = rows.filter(r => r.getLong(0) % 7 != 0)
    assert(clean.forall(r =>
      r.getAs[Long]("n_emails") == 0L || r.getAs[Long]("n_chars_removed") != 0L))
  }

  test("heaps curve ends at the true corpus totals and is monotone") {
    val rows = MiningQueries.queries("text_heaps_law")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cum_tokens"),
        r.getAs[Long]("cum_vocab")))
    assert(rows.length > 1)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._2 >= a._2 && b._3 >= a._3 })
    val docs = graft.Tables.documents(spark, sf)
    val totTokens = docs
      .select(size(split(lower(col("text")), " ")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    val totVocab = docs
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .select(countDistinct("t")).head.getLong(0)
    assert(rows.last._2 == totTokens && rows.last._3 == totVocab)
  }

  test("ccnet buckets: per-lang totals conserved, terciles bounded, value-ordered") {
    val sf = "/root/testdata/sf0.001"
    val rows = MiningQueries.queries("text_ccnet_buckets")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val perLangDocs = graft.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, bs) <- rows.groupBy(_._1)) {
      val n = bs.map(_._3).sum
      // every doc has ≥ 2 words in this corpus, so none drop out
      assert(n == perLangDocs(lang), s"$lang: $n != ${perLangDocs(lang)}")
      val byB = bs.map(b => b._2 -> b).toMap
      // tercile cut rule: cum(t1)·3 ≥ n ⇒ tail·3 ≥ n; head·3 ≤ n
      byB.get("tail").foreach(t => assert(t._3 * 3 >= n, s"$lang tail"))
      byB.get("head").foreach(h => assert(h._3 * 3 <= n, s"$lang head"))
      // buckets are value-contiguous: tail < middle < head by score
      for {
        lo <- byB.get("tail"); hi <- byB.get("middle")
      } assert(lo._5 < hi._4, s"$lang tail/middle overlap")
      for {
        lo <- byB.get("middle"); hi <- byB.get("head")
      } assert(lo._5 < hi._4, s"$lang middle/head overlap")
    }
  }
}
