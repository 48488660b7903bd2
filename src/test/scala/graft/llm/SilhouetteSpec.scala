package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sim_silhouette vs a plain-Scala replay on the collected corpus:
  * same quantized grid, same fold-order d2, same tie rule, same
  * (sqrt → subtract → divide → quantize) float tree — so the
  * per-cluster integer sums must match EXACTLY, proving the
  * distributed map-side scoring equals the sequential definition.
  */
class SilhouetteSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def replay(): (Map[Int, (Long, Long)], (Long, Long)) = {
    val q = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(ClusterQueries.KmQ) + lit(0.5))
            .cast("long")).as("qv"))
    val cents = ClusterQueries.centsRoundsOn(q).last
    val vecs = q.collect().map(r => r.getSeq[Long](1).toArray)
    val per = collection.mutable.Map.empty[Int, (Long, Long)]
    var totN = 0L
    var totS = 0L
    for (v <- vecs) {
      val d2s = cents.map { case (cid, cv) =>
        var acc = 0.0
        var i = 0
        while (i < cv.length) {
          val diff = v(i).toDouble - cv(i)
          acc += diff * diff
          i += 1
        }
        (acc, cid)
      }
      val (d2a, own) = d2s.minBy(identity)
      val d2b = d2s.filter(_._2 != own).map(_._1).min
      val a = math.sqrt(d2a)
      val b = math.sqrt(d2b)
      val s = if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      val sPpm = math.floor(s * 1000000.0 + 0.5).toLong
      val (n0, s0) = per.getOrElse(own, (0L, 0L))
      per(own) = (n0 + 1L, s0 + sPpm)
      totN += 1L
      totS += sPpm
    }
    (per.toMap, (totN, totS))
  }

  test("per-cluster sums equal the sequential replay bit-for-bit") {
    val rows = ClusterQueries.queries("sim_silhouette")(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n_members"),
        r.getAs[Long]("sum_s_ppm"), r.getAs[Double]("mean_s")))
      .toMap
    val (per, (totN, totS)) = replay()
    assert(rows.contains(-1), "overall row must be present")
    assert(rows(-1)._1 == totN && rows(-1)._2 == totS)
    val perRows = rows - (-1)
    assert(perRows.keySet == per.keySet,
      s"cluster sets differ: ${perRows.keySet} vs ${per.keySet}")
    for ((c, (n, sum, mean)) <- perRows) {
      assert((n, sum) == per(c), s"cluster $c: ($n,$sum) != ${per(c)}")
      assert(mean == sum.toDouble / 1000000.0 / n.toDouble)
      assert(mean >= -1.0 - 1e-9 && mean <= 1.0 + 1e-9)
    }
  }

  test("single-centroid training yields zero rows, mirroring the oracle inner join") {
    import spark.implicits._
    // one vector → stride init seeds exactly one centroid → no "other"
    // cluster exists; the oracle's own⋈oth inner join emits nothing,
    // so the engine must too (not NULL-sum rows)
    val dir = java.nio.file.Files.createTempDirectory("graft_sil1").toString
    Seq((0L, Array.tabulate(ClusterQueries.KmDim)(i => 0.01f * i), 0))
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    val out = ClusterQueries.queries("sim_silhouette")(spark, dir)
    assert(out.count() == 0L)
  }

  test("member counts tie out against the trainer census") {
    val sil = ClusterQueries.queries("sim_silhouette")(spark, sf)
      .collect().filter(_.getInt(0) >= 0)
      .map(r => r.getInt(0) -> r.getAs[Long]("n_members")).toMap
    val train = ClusterQueries.queries("sim_kmeans_train")(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("n_members")).toMap
    assert(sil == train,
      "silhouette census must equal the final-round training census")
  }
}
