package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graph_closeness_panel / graph_betweenness_panel vs textbook
  * sequential replays on the collected edge list: plain BFS per seed
  * for distances, and the classic stack-based Brandes accumulation
  * (with the engine's integer-ppm quantization applied at the same
  * points) — different algorithms, same answers, proving the
  * level-synchronous multi-seed joins compute the real thing.
  */
class CentralitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def graph(): (Map[Long, Seq[Long]], Seq[Long]) = {
    val e = GraphQueries.coSupplyEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
    (adj, adj.keys.toSeq.sorted)
  }

  private def bfs(adj: Map[Long, Seq[Long]], s: Long, radius: Int)
      : Map[Long, Int] = {
    val dist = collection.mutable.Map(s -> 0)
    var frontier = Seq(s)
    for (r <- 1 to radius) {
      frontier = frontier.flatMap(adj(_)).distinct
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = r)
    }
    dist.toMap
  }

  test("closeness panel equals the sequential BFS replay") {
    val (adj, nodes) = graph()
    val seeds = nodes.take(GraphQueries.ClosenessSeeds)
    val got = GraphQueries.queries("graph_closeness_panel")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_reached"),
        r.getAs[Long]("sum_dist"), r.getAs[Double]("closeness"),
        r.getAs[Double]("harmonic"))).toMap
    assert(got.keySet == seeds.toSet)
    for (s <- seeds) {
      val dist = bfs(adj, s, GraphQueries.ClosenessRadius)
      val sumD = dist.values.map(_.toLong).sum
      val h = dist.values.filter(_ > 0)
        .map(d => GraphQueries.HarmonicBase / d).sum
      val (nR, sD, cl, hm) = got(s)
      assert(nR == dist.size && sD == sumD, s"seed $s distances differ")
      assert(cl == (dist.size - 1).toDouble / sumD.toDouble)
      assert(hm == h.toDouble / GraphQueries.HarmonicBase.toDouble)
    }
  }

  test("betweenness panel equals the stack-based Brandes replay") {
    val (adj, nodes) = graph()
    val seeds = nodes.take(GraphQueries.BetwSeeds)
    val ppm = GraphQueries.BetwPpm
    val bet = collection.mutable.Map.empty[Long, Long]
    for (s <- seeds) {
      // forward: levels with path counts
      val dist = collection.mutable.Map(s -> 0)
      val sigma = collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      val levels = collection.mutable.ArrayBuffer(Seq(s))
      for (r <- 1 to GraphQueries.BetwRadius) {
        val nxt = frontier.flatMap(v => adj(v).map(_ -> sigma(v)))
          .filterNot(p => dist.contains(p._1))
          .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
        nxt.foreach { case (w, sg) => dist(w) = r; sigma(w) = sg }
        frontier = nxt.keys.toSeq
        levels += frontier
      }
      // backward: integer-ppm dependency accumulation per level
      val delta = collection.mutable.Map.empty[Long, Long]
      for (r <- (GraphQueries.BetwRadius - 1) to 1 by -1) {
        for (v <- levels(r)) {
          val c = adj(v).filter(w => dist.get(w).contains(r + 1))
            .map(w => sigma(v) * (ppm + delta.getOrElse(w, 0L)) / sigma(w))
            .sum
          if (adj(v).exists(w => dist.get(w).contains(r + 1)))
            delta(v) = c
        }
      }
      delta.foreach { case (v, dl) =>
        bet(v) = bet.getOrElse(v, 0L) + dl }
    }
    val want = bet.toSeq
      .sortBy { case (n, b) => (-b, n) }.take(20).zipWithIndex
      .map { case ((n, b), i) => (i + 1L, n, b) }
    val got = GraphQueries.queries("graph_betweenness_panel")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("b_ppm")))
      .toSeq
    assert(got == want,
      s"betweenness differs:\n got $got\nwant $want")
  }
}
