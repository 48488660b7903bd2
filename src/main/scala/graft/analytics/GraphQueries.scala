package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-analysis ranking over the customer↔supplier interaction graph
  * (who traded with whom, from orders⋈lineitem) — the PageRank-family
  * quality signal web-scale curation pipelines attach to domains
  * before sampling training data (complementing the similarity-graph
  * connected components in the dedup suite).
  *
  * Determinism contract: the entire iteration is INTEGER arithmetic —
  * initial mass 10^9 per node, per-edge contribution `mass div
  * out_deg`, damping `(85·incoming) div 100` — so there is no float
  * accumulation order to diverge on, and DuckDB replays the rounds
  * exactly with `//`. Truncation remainders evaporate identically in
  * both engines. Integer headroom: a hub's incoming mass is bounded
  * by the total endowment N·InitMass, and the damping multiply needs
  * 85× that inside BIGINT — so InitMass=10^9 is safe to N ≈ 10^8
  * nodes; a larger graph scales InitMass down (10^6 buys N ≈ 10^11)
  * rather than risking silent wraparound.
  *
  * Scale design: the edge list is built once (one orderkey shuffle)
  * and lineage-truncated; each round is edges ⋈ mass⋈deg → map-side
  * divide → one aggregate on dst. While the node count fits
  * [[BroadcastNodeBudget]] the mass⋈deg side ships as a broadcast
  * (edges never move after the initial build); past the budget — a
  * node-sized table is small relative to EDGES, not absolutely small,
  * and a 10^8-row broadcast is multi-GB, over Spark's 8 GB broadcast
  * ceiling and the driver budget long before the integer headroom
  * bites — each round degrades to a plain shuffle join on src, the
  * standard Pregel shape (both sides hash-partitioned on the key).
  * Rounds are chained declaratively (no driver loop over rows, no
  * collect). Every node in the symmetrized graph has out-degree ≥ 1,
  * so there is no dangling-mass branch to model.
  */
object GraphQueries extends QuerySuite {

  /** Supplier node ids live above customers: dst = SuppBase + suppkey.
    * 2^40 keeps the ranges disjoint to ~10^12 customers (TPC-H mints
    * 150k custkeys per sf, so collision would need sf ≈ 7·10^6 — far
    * past the 100 TB ≈ sf10^5 design point; the old 10^6 constant
    * collided at sf ≈ 7, silently merging node kinds AND breaking the
    * disjointness that lets Spark's non-deduplicating union match the
    * oracle's UNION). Disjointness is also what makes `node <
    * SuppBase` a correct kind decode. */
  val SuppBase = 1L << 40
  val InitMass = 1000000000L
  val Damping = 85L
  val Rounds = 3

  /** Per-round broadcast ceiling on the node count. 10^7 nodes ×
    * ~24 B/row ≈ 240 MB — inside executor memory and Spark's 8 GB
    * broadcast hard limit with margin; above it [[step]] switches to
    * the shuffle-join plan (see class doc). Same budget-then-degrade
    * pattern as the `text_token_ids` vocab broadcast. */
  val BroadcastNodeBudget = 10000000L

  /** Symmetrized distinct edge list (src, dst). */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val fwd = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (lit(SuppBase) + col("l_suppkey")).cast("long").as("dst"))
      .distinct()
    // computed once, lineage-truncated: three rounds re-read this
    // frame and must not re-run the orderkey shuffle each time (the
    // iterative-reuse pattern dedup_components documents)
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
  }

  /** One damped round: mass_r+1 = base + (85·incoming) div 100.
    * `bcast` picks the mass⋈deg ship strategy (see class doc);
    * `private[graft]` so GraphPlanSpec can assert both plan shapes. */
  private[graft] def step(e: DataFrame, deg: DataFrame, mass: DataFrame,
      bcast: Boolean = true): DataFrame = {
    val base = (15L * InitMass) / 100L
    val md = mass.join(deg, "node")
    val contrib = e.join(if (bcast) broadcast(md) else md,
        col("src") === col("node"))
      .select(col("dst"), expr("mass div out_deg").as("c"))
      .groupBy(col("dst").as("node")).agg(sum("c").as("in_mass"))
    deg.select("node").join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + expr(s"($Damping * coalesce(in_mass, 0L)) div 100"))
          .as("mass"))
  }

  /** WEIGHTED symmetrized edge list (src, dst, w): w = number of
    * lineitems traded between the endpoints — rank flows toward
    * intense relationships, not merely connected ones. */
  private def weightedEdges(s: SparkSession, d: String): DataFrame = {
    val fwd = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").cast("long").as("src"),
        (lit(SuppBase) + col("l_suppkey")).cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .localCheckpoint()
  }

  /** One damped weighted round: per-edge contribution
    * `(mass·w) div W_src`. Integer headroom: mass·w must stay inside
    * BIGINT — with total mass N·InitMass this bounds w_max·N·10^9 <
    * 2^63, i.e. edge weights to ~10^5 at 10^5 nodes; heavier graphs
    * scale InitMass down, as the unweighted contract documents. */
  private[graft] def stepWeighted(e: DataFrame, deg: DataFrame,
      mass: DataFrame, bcast: Boolean = true): DataFrame = {
    val base = (15L * InitMass) / 100L
    val md = mass.join(deg, "node")
    val contrib = e.join(if (bcast) broadcast(md) else md,
        col("src") === col("node"))
      .select(col("dst"), expr("(mass * w) div w_src").as("c"))
      .groupBy(col("dst").as("node")).agg(sum("c").as("in_mass"))
    deg.select("node").join(contrib, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + expr(s"($Damping * coalesce(in_mass, 0L)) div 100"))
          .as("mass"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-20 nodes after three damped rounds, integer masses only.
    "graph_pagerank_top" -> ((s, d) => {
      val e = edges(s, d)
      // node-sized; materialized once — deg is referenced by every
      // round plus the init, and each reference would otherwise
      // re-aggregate the full edge list
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("out_deg"))
        .localCheckpoint()
      // one O(partitions) count over the checkpointed node table
      // decides the per-round ship strategy (see BroadcastNodeBudget)
      val bcast = deg.count() <= BroadcastNodeBudget
      var mass = deg.select(col("node"), lit(InitMass).as("mass"))
      for (_ <- 1 to Rounds) mass = step(e, deg, mass, bcast)
      // top-k FIRST (TakeOrderedAndProject — per-partition heads, no
      // node-sized single-partition window), then rank the 20
      // survivors; the residual unpartitioned window is 20 rows
      mass.orderBy(col("mass").desc, col("node")).limit(20)
        .withColumn("kind",
          when(col("node") < SuppBase, "customer").otherwise("supplier"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("mass").desc, col("node"))).cast("long"))
        .select("rk", "node", "kind", "mass")
        .orderBy("rk")
    }),

    // The WEIGHTED variant: contributions proportional to trade
    // intensity. Same shuffle shape, same integer determinism.
    "graph_pagerank_weighted" -> ((s, d) => {
      val e = weightedEdges(s, d)
      val deg = e.groupBy(col("src").as("node"))
        .agg(sum("w").as("w_src"))
        .localCheckpoint()
      val bcast = deg.count() <= BroadcastNodeBudget
      var mass = deg.select(col("node"), lit(InitMass).as("mass"))
      for (_ <- 1 to Rounds) mass = stepWeighted(e, deg, mass, bcast)
      mass.orderBy(col("mass").desc, col("node")).limit(20)
        .withColumn("kind",
          when(col("node") < SuppBase, "customer").otherwise("supplier"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("mass").desc, col("node"))).cast("long"))
        .select("rk", "node", "kind", "mass")
        .orderBy("rk")
    }))

  def oracles: Map[String, String] = Map(
    "graph_pagerank_top" -> {
      val base = (15L * InitMass) / 100L
      val rounds = (1 to Rounds).map { r =>
        s"""m$r AS (
           |  SELECT n.node,
           |    CAST($base + ($Damping * coalesce(c.in_mass, 0)) // 100
           |      AS BIGINT) AS mass
           |  FROM deg n LEFT JOIN (
           |    SELECT e.dst AS node,
           |      CAST(sum(m.mass // d.out_deg) AS BIGINT) AS in_mass
           |    FROM edges e
           |    JOIN m${r - 1} m ON e.src = m.node
           |    JOIN deg d ON e.src = d.node
           |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey AS src, $SuppBase + l_suppkey AS dst
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |edges AS (SELECT src, dst FROM e0
         |          UNION SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src AS node, count(*) AS out_deg
         |        FROM edges GROUP BY src),
         |m0 AS (SELECT node, CAST($InitMass AS BIGINT) AS mass FROM deg),
         |$rounds
         |SELECT rk, node, kind, mass FROM (
         |  SELECT node, mass,
         |    CASE WHEN node < $SuppBase THEN 'customer'
         |         ELSE 'supplier' END AS kind,
         |    row_number() OVER (ORDER BY mass DESC, node) AS rk
         |  FROM m$Rounds)
         |WHERE rk <= 20 ORDER BY rk""".stripMargin
    },

    "graph_pagerank_weighted" -> {
      val base = (15L * InitMass) / 100L
      val rounds = (1 to Rounds).map { r =>
        s"""m$r AS (
           |  SELECT n.node,
           |    CAST($base + ($Damping * coalesce(c.in_mass, 0)) // 100
           |      AS BIGINT) AS mass
           |  FROM deg n LEFT JOIN (
           |    SELECT e.dst AS node,
           |      CAST(sum((m.mass * e.w) // d.w_src) AS BIGINT) AS in_mass
           |    FROM edges e
           |    JOIN m${r - 1} m ON e.src = m.node
           |    JOIN deg d ON e.src = d.node
           |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT o_custkey AS src, $SuppBase + l_suppkey AS dst,
         |    count(*) AS w
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1, 2),
         |edges AS (SELECT src, dst, w FROM e0
         |          UNION ALL SELECT dst AS src, src AS dst, w FROM e0),
         |deg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS w_src
         |        FROM edges GROUP BY src),
         |m0 AS (SELECT node, CAST($InitMass AS BIGINT) AS mass FROM deg),
         |$rounds
         |SELECT rk, node, kind, mass FROM (
         |  SELECT node, mass,
         |    CASE WHEN node < $SuppBase THEN 'customer'
         |         ELSE 'supplier' END AS kind,
         |    row_number() OVER (ORDER BY mass DESC, node) AS rk
         |  FROM m$Rounds)
         |WHERE rk <= 20 ORDER BY rk""".stripMargin
    })
}
