package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text_vocab_coverage vs an independent brute-force replay: the
  * query aggregates pro-rata coverage over the count-of-counts table;
  * the replay sorts the actual term list by (count desc) and sums the
  * top-V prefix directly — tie classes make any specific tie order
  * valid, and the pro-rata formula must equal the prefix sum for
  * EVERY tie order, which the class-sum replay checks.
  */
class VocabCoverageSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def termCounts(): Array[Long] =
    graft.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))

  test("coverage equals the sorted-prefix brute force at every checkpoint") {
    val counts = termCounts().sortBy(-_)
    val totalOcc = counts.sum
    val rows = TextQueries.queries("text_vocab_coverage")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vocab_size"), r.getAs[Long]("total_terms"),
        r.getAs[Long]("total_occ"), r.getAs[Long]("covered_occ"),
        r.getAs[Long]("coverage_ppm")))
    assert(rows.map(_._1).toSeq == TextQueries.VocabCheckpoints)
    for ((v, totT, totO, cov, ppm) <- rows) {
      assert(totT == counts.length.toLong)
      assert(totO == totalOcc)
      val want = counts.take(v.toInt).sum
      assert(cov == want, s"V=$v: covered $cov want $want")
      assert(ppm == cov * 1000000L / totalOcc)
    }
  }

  test("coverage is monotone in V and saturates past the vocabulary") {
    val rows = TextQueries.queries("text_vocab_coverage")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vocab_size"), r.getAs[Long]("total_terms"),
        r.getAs[Long]("total_occ"), r.getAs[Long]("covered_occ")))
      .sortBy(_._1)
    assert(rows.sliding(2).forall { case Array(a, b) => b._4 >= a._4 })
    for ((v, totT, totO, cov) <- rows if v >= totT)
      assert(cov == totO, s"V=$v >= vocab $totT must cover everything")
    // the fixture vocabulary must exceed the smallest checkpoint for
    // the curve to be non-trivial
    assert(rows.head._2 > rows.head._1)
  }
}
