package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text_pmi_collocations vs a plain-Scala replay: same bigram
  * population, same marginals, same lift float tree, same
  * (lift desc, x, y) cut — exact agreement on the full top-K.
  */
class CollocationSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("top-K lift ranking equals the sequential replay") {
    val texts = graft.Tables.documents(spark, sf)
      .select(lower(col("text"))).collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val ws = t.split(" ", -1)
      if (ws.length < 2) Array.empty[(String, String)]
      else ws.dropRight(1).zip(ws.drop(1))
    }
    val cxy = bigrams.groupBy(identity).map { case (p, xs) =>
      p -> xs.length.toLong }
    val cx = cxy.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val cy = cxy.groupBy(_._1._2).map { case (y, m) => y -> m.values.sum }
    val nTotal = cxy.values.sum
    val want = cxy.toSeq
      .filter(_._2 >= TextQueries.PmiMinPairCount)
      .map { case ((x, y), nxy) =>
        val lift = (nxy.toDouble * nTotal) / (cx(x).toDouble * cy(y))
        (x, y, nxy, cx(x), cy(y), lift)
      }
      .sortBy { case (x, y, _, _, _, lift) => (-lift, x, y) }
      .take(TextQueries.PmiTopK)
    val got = TextQueries.queries("text_pmi_collocations")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_xy"),
        r.getAs[Long]("n_x"), r.getAs[Long]("n_y"),
        r.getAs[Double]("lift")))
      .toSeq
    assert(got == want, s"top-K mismatch:\n got=${got.take(5)}\nwant=${want.take(5)}")
  }

  test("every reported collocation clears the count floor and lift > 1") {
    val rows = TextQueries.queries("text_pmi_collocations")(spark, sf)
      .collect()
    assert(rows.length == TextQueries.PmiTopK)
    for (r <- rows) {
      assert(r.getAs[Long]("n_xy") >= TextQueries.PmiMinPairCount)
      // a top-30 collocation in a real corpus co-occurs above chance
      assert(r.getAs[Double]("lift") > 1.0,
        s"${r.getString(0)} ${r.getString(1)} lift ${r.getAs[Double]("lift")}")
    }
  }
}
