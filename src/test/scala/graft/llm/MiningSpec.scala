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
}
