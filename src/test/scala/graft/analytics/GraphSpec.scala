package graft.analytics

import graft.SparkSpec

/** Replays the integer PageRank driver-side on sf0.001 and pins the
  * query's top-20 masses against it exactly — the iteration has no
  * float accumulation, so the match is bit-exact, not approximate.
  */
class GraphSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("top-20 masses equal an exact driver-side replay") {
    val fwd = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawEdges = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").collect()
      .flatMap { r =>
        fwd.get(r.getLong(0)).map(c =>
          (c, GraphQueries.SuppBase + r.getLong(1)))
      }.toSet
    val edges = rawEdges ++ rawEdges.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var mass: Map[Long, Long] = deg.map { case (n, _) => n -> GraphQueries.InitMass }
    val base = 15L * GraphQueries.InitMass / 100L
    for (_ <- 1 to GraphQueries.Rounds) {
      val in = edges.toSeq
        .map { case (s, t) => t -> mass(s) / deg(s) }
        .groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).sum }
      mass = deg.map { case (n, _) =>
        n -> (base + GraphQueries.Damping * in.getOrElse(n, 0L) / 100L)
      }
    }
    val expect = mass.toSeq.sortBy { case (n, m) => (-m, n) }.take(20)
      .zipWithIndex.map { case ((n, m), i) => (i + 1L, n, m) }

    val got = GraphQueries.queries("graph_pagerank_top")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === expect)
    // damping strictly dissipates truncated mass: total after rounds
    // can never exceed the initial endowment
    assert(mass.values.sum <= deg.size.toLong * GraphQueries.InitMass)
  }

  test("weighted top-20 masses equal an exact driver-side replay") {
    val fwd = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawW = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").collect()
      .flatMap { r =>
        fwd.get(r.getLong(0)).map(c =>
          (c, GraphQueries.SuppBase + r.getLong(1)))
      }.groupBy(identity).map { case (e, es) => e -> es.length.toLong }
    val edges = rawW ++ rawW.map { case ((a, b), w) => (b, a) -> w }
    val wSrc = edges.groupBy(_._1._1)
      .map { case (n, es) => n -> es.values.sum }
    var mass: Map[Long, Long] =
      wSrc.map { case (n, _) => n -> GraphQueries.InitMass }
    val base = 15L * GraphQueries.InitMass / 100L
    for (_ <- 1 to GraphQueries.Rounds) {
      val in = edges.toSeq
        .map { case ((s0, t0), w) => t0 -> mass(s0) * w / wSrc(s0) }
        .groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).sum }
      mass = wSrc.map { case (n, _) =>
        n -> (base + GraphQueries.Damping * in.getOrElse(n, 0L) / 100L)
      }
    }
    val expect = mass.toSeq.sortBy { case (n, m) => (-m, n) }.take(20)
      .zipWithIndex.map { case ((n, m), i) => (i + 1L, n, m) }
    val got = GraphQueries.queries("graph_pagerank_weighted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === expect)
  }

  test("every per-round mass join is broadcast; no nested-loop shapes") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val df = GraphQueries.queries("graph_pagerank_top")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val loops = plan.collect {
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }
      assert(loops.isEmpty, s"nested-loop join in PageRank plan:\n$loops")
      val bcast = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      // one broadcast per round (edges ⋈ mass) at minimum — the
      // edge-sized side must never shuffle for the mass join
      assert(bcast.size >= GraphQueries.Rounds,
        s"expected ≥${GraphQueries.Rounds} broadcast joins, got ${bcast.size}")
    } finally prevAqe match {
      case Some(v) => spark.conf.set(aqeKey, v)
      case None => spark.conf.unset(aqeKey)
    }
  }

  test("past BroadcastNodeBudget a round degrades to a shuffle join with identical masses") {
    import org.apache.spark.sql.functions._
    val aqeKey = "spark.sql.adaptive.enabled"
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevAqe = spark.conf.getOption(aqeKey)
    val prevAbt = spark.conf.getOption(abtKey)
    spark.conf.set(aqeKey, "false")
    // simulate a node table past any broadcast budget: forbid Spark
    // from auto-broadcasting what the hint no longer marks
    spark.conf.set(abtKey, "-1")
    try {
      import spark.implicits._
      val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
        .toDF("src", "dst")
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("out_deg"))
      val m0 = deg.select(col("node"), lit(GraphQueries.InitMass).as("mass"))
      val viaB = GraphQueries.step(e, deg, m0, bcast = true)
      val viaS = GraphQueries.step(e, deg, m0, bcast = false)
      viaS.collect()
      val planS = viaS.queryExecution.executedPlan
      assert(planS.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }.isEmpty, s"fallback path still broadcasts:\n$planS")
      assert(planS.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.nonEmpty, s"fallback path has no shuffle join:\n$planS")
      // both ship strategies compute the same integer masses
      val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
      assert(viaS.collect().map(key).sorted.toSeq ===
        viaB.collect().map(key).sorted.toSeq)
    } finally {
      prevAqe match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
      prevAbt match {
        case Some(v) => spark.conf.set(abtKey, v)
        case None => spark.conf.unset(abtKey)
      }
    }
  }

  test("triangle census equals brute-force triple enumeration") {
    // rebuild the thresholded co-supply graph driver-side...
    val baskets = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted)
      .filter(_.size <= GraphQueries.MaxBasket)
    val pairCnt = baskets.flatMap(b =>
        for (i <- b.indices; j <- i + 1 until b.size) yield (b(i), b(j)))
      .groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    val total = pairCnt.values.sum
    val nPairs = pairCnt.size.toLong
    // NB: not Map.collect-to-tuples — that would rebuild a Map and
    // silently dedupe edges by their first endpoint
    val edges = pairCnt.filter { case (_, c) => c * nPairs > total }.keySet
    // ...then count triangles the O(n^3) way no production plan could
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    def adj(a: Long, b: Long) =
      edges.contains(if (a < b) (a, b) else (b, a))
    val triples = for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      if adj(nodes(i), nodes(j))
      k <- j + 1 until nodes.size
      if adj(nodes(i), nodes(k)) && adj(nodes(j), nodes(k))
    } yield 1
    val deg = nodes.map(n =>
      edges.count(p => p._1 == n || p._2 == n).toLong)
    val r = GraphQueries.queries("graph_triangles")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("n_wedges") == deg.map(d => d * (d - 1) / 2).sum)
    assert(r.getAs[Long]("n_triangles") == triples.size.toLong)
    assert(triples.nonEmpty, "fixture graph must contain triangles")
  }

  test("label propagation equals a driver-side synchronous replay") {
    val fwd = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawEdges = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").collect()
      .flatMap { r =>
        fwd.get(r.getLong(0)).map(c =>
          (c, GraphQueries.SuppBase + r.getLong(1)))
      }.toSet
    val edges = (rawEdges ++ rawEdges.map { case (a, b) => (b, a) }).toSeq
    var labels: Map[Long, Long] = edges.map(_._1).distinct
      .map(n => n -> n).toMap
    for (_ <- 1 to GraphQueries.LpaRounds) {
      labels = edges.map { case (s, t) => t -> labels(s) }
        .groupBy(_._1).map { case (n, ls) =>
          val byLabel = ls.map(_._2).groupBy(identity)
            .map { case (l, xs) => l -> xs.size }
          // most frequent label, smallest label on ties
          n -> byLabel.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
    }
    val expect = labels.values.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }.toSeq
      .sortBy { case (l, sz) => (-sz, l) }.take(20)
      .zipWithIndex.map { case ((l, sz), i) => (i + 1L, l, sz) }
    val got = GraphQueries.queries("graph_label_prop")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expect)
  }

  test("graph_bfs_depth equals queue-based BFS from the min node") {
    val sf = "/root/testdata/sf0.001"
    // rebuild the co-supply edge set brute-force (the coSupplyEdges
    // contract: distinct (order, supplier), basket cap, strict
    // above-mean pair count)
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      .filter(_._2.length <= GraphQueries.MaxBasket).toMap
    val pairCnt = baskets.values.flatMap { ss =>
      for (i <- ss.indices; j <- (i + 1) until ss.length)
        yield (ss(i), ss(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = pairCnt.values.sum
    val nPairs = pairCnt.size.toLong
    // same Map.collect-to-tuples trap the triangle test documents:
    // filter + keySet, never collect to (u, v) pairs
    val edges = pairCnt.filter { case (_, c) => c * nPairs > total }.keySet
    val adj = (edges ++ edges.map { case (u, v) => (v, u) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val srcNode = adj.keys.min
    val dist = scala.collection.mutable.Map(srcNode -> 0L)
    var frontier = Set(srcNode)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(adj(_)).diff(dist.keySet)
      val d = dist(frontier.head) + 1L
      next.foreach(n => dist(n) = d)
      frontier = next
    }
    val got = GraphQueries.queries("graph_bfs_depth")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toMap === dist.toMap)
    // level-synchronous: rows ordered by node, distances start at 0
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    assert(got.toMap.apply(srcNode) === 0L)
  }

  test("k-core membership equals an exact driver-side peel") {
    val k = GraphQueries.KCoreK
    val edges = GraphQueries.coSupplyEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sym = edges ++ edges.map { case (u, v) => (v, u) }
    def degrees(nodes: Set[Long]): Map[Long, Long] = sym.toSeq
      .filter { case (a, b) => nodes(a) && nodes(b) }
      .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var nodes = sym.toSeq.groupBy(_._1)
      .collect { case (n, es) if es.size >= k => n }.toSet
    var changed = true
    while (changed) {
      val next = degrees(nodes).collect {
        case (n, dg) if dg >= k => n
      }.toSet
      changed = next != nodes
      nodes = next
    }
    val expect = degrees(nodes)
    val got = GraphQueries.queries("graph_kcore")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toMap === expect)
    // core property: every member keeps ≥ k neighbors inside the core
    assert(got.forall(_._2 >= k))
    // output is ordered by node id (presentation contract)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
  }
}
