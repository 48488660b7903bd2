package graft.llm

import graft.SparkSpec
import SimilarityQueries._

/** Pins sim_pq_codes against an independent driver-side PQ
  * recomputation over the same corpus: same stride codebooks, same
  * argmin tie-break, exact same code assignments and reconstruction
  * error for every vector.
  */
class PqSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def embeddings: Map[Long, Array[Double]] =
    graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("codes and error equal a driver-side PQ recomputation, per vector") {
    val emb = embeddings
    val cents = emb.keys.filter(id =>
        id % PqStride == 0 && id < PqStride.toLong * PqK)
      .toSeq.sorted.map(id => (id / PqStride).toInt -> emb(id)).toMap
    def sub(v: Array[Double], m: Int): Array[Double] =
      v.slice(m * PqDsub, (m + 1) * PqDsub)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val rows = SimilarityQueries.queries("sim_pq_codes")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      var err = 0.0
      for (m <- 0 until PqM) {
        val dists = cents.toSeq.map { case (cId, cv) =>
          (d2(sub(emb(id), m), sub(cv, m)), cId) }.sorted
        val (bd, bc) = dists.head
        assert(r.getInt(1 + m) == bc, s"vec $id subspace $m")
        err += bd
      }
      assert(r.getDouble(1 + PqM) == err, s"vec $id err")
    }
  }

  test("ADC top-k equals a driver-side table-lookup recomputation") {
    val emb = embeddings
    val cents = emb.keys.filter(id =>
        id % PqStride == 0 && id < PqStride.toLong * PqK)
      .toSeq.sorted.map(id => (id / PqStride).toInt -> emb(id)).toMap
    def sub(v: Array[Double], m: Int): Array[Double] =
      v.slice(m * PqDsub, (m + 1) * PqDsub)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val codes = emb.map { case (id, v) =>
      id -> (0 until PqM).map { m =>
        cents.toSeq.map { case (cId, cv) =>
          (d2(sub(v, m), sub(cv, m)), cId) }.sorted.head._2
      }
    }
    val want = emb.keys.filter(_ < 10).toSeq.sorted.flatMap { q =>
      val ranked = emb.keys.filter(_ != q).toSeq.map { v =>
        var adc = 0.0
        for (m <- 0 until PqM) adc += d2(sub(emb(q), m), sub(cents(codes(v)(m)), m))
        (v, adc)
      }.sortBy { case (v, adc) => (adc, v) }.take(TopK)
      ranked.zipWithIndex.map { case ((v, adc), i) => (q, i + 1L, v, adc) }
    }
    val got = SimilarityQueries.queries("sim_pq_adc_topk")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("IVF-PQ: hits share the query's cluster, ranked by ascending adc") {
    val rows = SimilarityQueries.queries("sim_ivfpq_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length == 1,
        s"query $q hits must all come from its own cluster")
      val adcs = rs.sortBy(_.getLong(2)).map(_.getDouble(4))
      assert(adcs.sameElements(adcs.sorted), s"query $q adc ordering")
      assert(!rs.exists(_.getLong(3) == q), "self excluded")
    }
  }

  test("codebook vectors reconstruct exactly; codes stay in range") {
    val rows = SimilarityQueries.queries("sim_pq_codes")(spark, sf).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val cbIds = byId.keys.filter(id =>
      id % PqStride == 0 && id < PqStride.toLong * PqK).toSeq.sorted
    assert(cbIds.nonEmpty)
    cbIds.foreach { id =>
      val r = byId(id)
      assert(r.getDouble(1 + PqM) == 0.0, s"codebook vec $id must have err 0")
    }
    val r0 = byId(0L)
    assert((0 until PqM).forall(m => r0.getInt(1 + m) == 0))
    rows.foreach { r =>
      for (m <- 0 until PqM) {
        val c = r.getInt(1 + m)
        assert(c >= 0 && c < PqK)
      }
      assert(r.getDouble(1 + PqM) >= 0.0)
    }
  }
}
