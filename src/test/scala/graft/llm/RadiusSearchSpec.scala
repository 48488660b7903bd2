package graft.llm

import graft.SparkSpec

/** sim_radius_search against a driver-side exact replay: the range
  * selection must return EXACTLY the pairs clearing τ — no rank
  * truncation, no candidate-set misses (it is the exact-scan
  * baseline) — and every returned cosine must clear the threshold.
  */
class RadiusSearchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("radius search equals an exact driver-side threshold scan") {
    val embs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val nrm = embs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val emap = embs.toMap
    val qs = embs.filter(_._1 < 10)
    val expect = (for {
      (qid, qv) <- qs
      (vid, v) <- embs if vid != qid
      cos = dot(qv, v) / (nrm(qid) * nrm(vid))
      if cos >= SimilarityQueries.RadiusTau
    } yield (qid, vid)).toSet

    val got = SimilarityQueries.queries("sim_radius_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.map(t => (t._1, t._2)).toSet === expect)
    assert(got.forall(_._3 >= SimilarityQueries.RadiusTau))
    // cosines agree with the driver replay to float tolerance (the
    // engine sums in a different order than this naive loop)
    got.foreach { case (qid, vid, cos) =>
      val ref = dot(emap(qid), emap(vid)) / (nrm(qid) * nrm(vid))
      assert(math.abs(cos - ref) < 1e-9, s"($qid,$vid): $cos vs $ref")
    }
  }
}
