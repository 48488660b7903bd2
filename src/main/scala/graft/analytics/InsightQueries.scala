package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Exact._

/** Decision-support analytics: association mining, dominance (skyline),
  * rank tests, distribution distance, and link prediction — the
  * exploratory layer an analyst runs on top of the warehouse the rest
  * of the surface maintains.
  *
  * Determinism contract (same as [[StatQueries]]): every aggregate is
  * an INTEGER sum (counts, cents, ppb-quantized terms); the only float
  * ops are final per-row division/sqrt on those exact integers, which
  * are correctly rounded in IEEE-754 and therefore bit-identical in
  * Spark and DuckDB. Where a statistic's textbook form needs a float
  * SUM (Bhattacharyya affinity, resource allocation), each term is
  * quantized to integer parts-per-billion FIRST (floor of a
  * correctly-rounded double) and the ppb integers are summed — the
  * quantization is the query's defined semantics, so any aggregation
  * order and any engine agree. log() never appears: it is not
  * correctly rounded and differs across libm implementations, so
  * log-based measures (Adamic-Adar, KL/JS divergence) are replaced by
  * their log-free published counterparts (resource allocation — Zhou
  * et al., EPJ B 2009; Hellinger/Bhattacharyya distance).
  *
  * Integer headroom at 100 TB: cross products of group counts (c·d,
  * o²·10⁹) bound group sizes to ~10⁹ rows before BIGINT overflow —
  * past that the moments swap to DECIMAL(38,0) sums with the same plan
  * shape (see the StatQueries header for the same argument).
  */
object InsightQueries extends QuerySuite {

  /** Baskets larger than this are dropped before the pair self-join:
    * pair volume per basket is C(k,2), so the cap bounds the join
    * output at C(64,2)·baskets regardless of corpus size (the same
    * guard class as GraphQueries.MaxFanout). TPC-H-shaped orders have
    * ≤7 lines, so at any sf the cap drops nothing — it exists for the
    * 100 TB case where a malformed mega-basket would otherwise emit
    * a quadratic pair set. */
  private val MaxBasket = 64

  /** Pairs below this co-occurrence count are statistical noise for
    * lift estimation (a single shared order makes lift explode at
    * small item supports). Classic Apriori min-support pruning. */
  private val MinPairSupport = 3

  /** Deterministic result cap for ranked pair outputs. */
  private val TopPairs = 200

  private def dayCol(ts: Column): Column =
    floor(unix_timestamp(ts) / 86400L).cast("long")

  /** Thursday-anchored day-of-week (1970-01-01 was a Thursday):
    * (epoch_day + 4) % 7 → 0=Sunday, 6=Saturday. Same convention as
    * StatQueries/ProfileQueries. */
  private def weekendCol(ts: Column): Column = {
    val dow = (dayCol(ts) + 4L) % 7L
    dow === 0L || dow === 6L
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Market-basket association rules over order baskets (Agrawal &
    // Srikant, VLDB'94): which part pairs co-occur in the same order
    // more than their independent popularities predict (lift > 1)?
    // Scale shape: the basket self-join is keyed on the order id (both
    // sides co-partitioned by the SAME shuffle), per-basket pair count
    // is capped at C(MaxBasket,2), and min-support pruning keeps the
    // pair aggregate sparse. Item supports join back onto the
    // pair-count table (pair-count-sized, not lineitem-sized). Counts
    // are exact integers; lift/confidence are single final divisions.
    "basket_pair_lift" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val okBaskets = items.groupBy("o").agg(count(lit(1)).as("k"))
        .filter(col("k") <= MaxBasket).select("o")
      val it = items.join(okBaskets, Seq("o"), "left_semi")
      val nOrders = it.select(countDistinct("o").as("n_orders"))
      val supp = it.groupBy("p").agg(count(lit(1)).as("c"))
      val pairs = it.select(col("o"), col("p").as("part_a"))
        .join(it.select(col("o"), col("p").as("part_b")), Seq("o"))
        .filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b").agg(count(lit(1)).as("pair_orders"))
        .filter(col("pair_orders") >= MinPairSupport)
      pairs
        .join(supp.select(col("p").as("part_a"), col("c").as("orders_a")),
          "part_a")
        .join(supp.select(col("p").as("part_b"), col("c").as("orders_b")),
          "part_b")
        .crossJoin(broadcast(nOrders))
        .select(col("part_a"), col("part_b"), col("pair_orders"),
          col("orders_a"), col("orders_b"),
          ((col("pair_orders") * col("n_orders")).cast("double") /
            (col("orders_a") * col("orders_b")).cast("double")).as("lift"),
          (col("pair_orders").cast("double") /
            col("orders_a").cast("double")).as("conf_ab"))
        .orderBy(desc("pair_orders"), col("part_a"), col("part_b"))
        .limit(TopPairs)
    }),

    // Skyline (pareto-front) orders: maximize (order date, total
    // price) — no other order is both newer and at-least-as-expensive
    // (strict somewhere). The BNL/NN skyline literature (Börzsönyi et
    // al., ICDE'01) is quadratic; in 2-D the front falls out of one
    // per-day max + one running max over the DAY table — day count
    // grows with calendar time, not data volume, so the single
    // ordered window is bounded (same argument as the hot-hour
    // broadcast in join_interval_overlap). Equal (day, price) points
    // all survive (no strict dominance between them).
    "agg_pareto_orders" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        dayCol(col("o_orderdate")).as("od"),
        cents(col("o_totalprice")).as("pc"))
      val daymax = o.groupBy("od").agg(max("pc").as("dmax"))
      val laterMax = max(col("dmax")).over(
        Window.orderBy(desc("od"))
          .rowsBetween(Window.unboundedPreceding, -1))
      val sky = daymax.withColumn("later", laterMax)
        .filter(col("later").isNull || col("dmax") > col("later"))
        .select(col("od").as("sod"), col("dmax"))
      o.join(broadcast(sky),
          col("od") === col("sod") && col("pc") === col("dmax"))
        .select(col("o_orderkey"), col("od"),
          (col("pc") / 100.0).as("price"))
        .orderBy("o_orderkey")
    }),

    // Chi-square test of independence between customer market segment
    // and order priority, plus Cramér's V effect size. Exact-integer
    // algebra: chi2 = N·Σ o²/(rt·ct) − N, with each cell's term
    // quantized to ppb by integer division BEFORE the sum — the sum is
    // associative and engine-independent; the final N·T/10⁹ − N and
    // sqrt are single correctly-rounded float ops. Scale shape: one
    // fact-side aggregate to the (segment × priority) cell table
    // (≤ r·c rows), marginals derived FROM the cell table (no second
    // fact scan), everything after is broadcast-sized.
    "stat_chi_square" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy("c_mktsegment").agg(sum("o").as("rt"))
      val ct = cells.groupBy("o_orderpriority").agg(sum("o").as("ct"))
      val tot = cells.agg(sum("o").as("n"),
        countDistinct("c_mktsegment").as("r"),
        countDistinct("o_orderpriority").as("c"))
      val t = cells.join(broadcast(rt), "c_mktsegment")
        .join(broadcast(ct), "o_orderpriority")
        .select(expr("o * o * 1000000000L div (rt * ct)").as("t_ppb"))
        .agg(sum("t_ppb").as("t_sum"))
      t.crossJoin(broadcast(tot))
        .select(col("n"),
          ((col("r") - 1L) * (col("c") - 1L)).as("df"),
          ((col("n") * col("t_sum")).cast("double") / 1.0e9 -
            col("n").cast("double")).as("chi2"),
          least(col("r") - 1L, col("c") - 1L).as("k"))
        .select(col("n"), col("df"), col("chi2"),
          sqrt(col("chi2") / (col("n") * col("k")).cast("double"))
            .as("cramers_v"))
    }),

    // Mann-Whitney U rank-sum test: do BUILDING-segment orders run
    // systematically larger than MACHINERY-segment orders? Mid-rank
    // tie handling and the tie-corrected normal approximation, all in
    // exact integer algebra on the VALUE-COUNT table (doubled ranks
    // keep .5 mid-ranks integral): 2U_A = Σ nA_v·(2·cum_v + t_v + 1)
    // − nA·(nA+1) … wait, minus nA(nA+1) — see oracle twin. The only
    // floats are the final z denominator's divisions and sqrt. Scale
    // shape: ranks come from a cumulative window over the DISTINCT
    // cents-value count table, never raw rows (same pattern as
    // stat_percentile_cont's rank selection).
    "stat_mann_whitney" -> ((s, d) => {
      val g = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(cents(col("o_totalprice")).as("v"),
          (col("c_mktsegment") === "BUILDING").as("isA"))
      val vc = g.groupBy("v").agg(
        sum(when(col("isA"), 1L).otherwise(0L)).as("na_v"),
        count(lit(1)).as("t_v"))
      val cum = vc.withColumn("below",
        coalesce(sum("t_v").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val agg0 = cum.agg(
        sum(col("na_v") * (col("below") * 2L + col("t_v") + 1L))
          .as("r2a"),
        sum("na_v").as("na"),
        sum("t_v").as("n"),
        sum(col("t_v") * col("t_v") * col("t_v") - col("t_v")).as("ts"))
      agg0.select(col("na"), (col("n") - col("na")).as("nb"), col("n"),
          (col("r2a") - col("na") * (col("na") + 1L)).as("u2a"),
          col("ts"))
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          (col("u2a").cast("double") / 2.0).as("u_a"),
          ((col("u2a") - col("na") * col("nb")).cast("double") /
            (lit(2.0) * sqrt(
              (col("na") * col("nb")).cast("double") / 12.0 *
                ((col("n") + 1L).cast("double") -
                  col("ts").cast("double") /
                    (col("n") * (col("n") - 1L)).cast("double")))))
            .as("z"))
    }),

    // Hellinger distance between the weekday and weekend event-type
    // mixes — "did the traffic composition shift?" in a bounded [0,1]
    // metric. The Bhattacharyya affinity Σ√(p·q) is a float sum, so
    // each term is ppb-quantized first (floor(√(c·d / (N1·N2))·10⁹) —
    // every op correctly rounded, then exact integer sum); the
    // distance is √(1 − B) on the exact ppb total. One fact-side
    // aggregate to the per-type 2-column count table; everything
    // after is type-count-sized.
    "stat_hellinger_segments" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        weekendCol(col("ts")).as("wkend"))
      val m = ev.groupBy("event_type").agg(
        sum(when(!col("wkend"), 1L).otherwise(0L)).as("c"),
        sum(when(col("wkend"), 1L).otherwise(0L)).as("e"))
      val tot = m.agg(sum("c").as("n1"), sum("e").as("n2"))
      val terms = m.crossJoin(broadcast(tot))
        .select(floor(sqrt((col("c") * col("e")).cast("double") /
          (col("n1") * col("n2")).cast("double")) * 1.0e9)
          .cast("long").as("b_ppb"))
      terms.agg(sum("b_ppb").as("b_sum"), count(lit(1)).as("n_types"))
        .select(col("n_types"),
          (col("b_sum").cast("double") / 1.0e9).as("bhattacharyya"),
          sqrt(lit(1.0) - col("b_sum").cast("double") / 1.0e9)
            .as("hellinger"))
    }),

    // Quantified-comparison shape (x > ALL correlated subquery):
    // orders strictly more expensive than EVERY AUTOMOBILE-segment
    // order of the same priority. The oracle spells the textbook
    // > ALL; the engine decorrelates it by hand into a per-priority
    // max aggregate left-joined back (null max ⇒ vacuous truth) —
    // the rewrite Catalyst itself applies to quantified predicates.
    // Comparison happens in exact cents (monotone in the raw money
    // column, so the two spellings agree row-for-row).
    "sql_quantified_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val autoMax = o
        .join(Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(max(cents(col("o_totalprice"))).as("amax"))
      o.join(broadcast(autoMax), o("o_orderpriority") === autoMax("prio"),
          "left")
        .filter(col("amax").isNull || cents(col("o_totalprice")) > col("amax"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }))

  def oracles: Map[String, String] = Map(
    "basket_pair_lift" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |ok AS (SELECT o FROM items GROUP BY o
         |       HAVING count(*) <= $MaxBasket),
         |it AS (SELECT items.o, items.p FROM items JOIN ok USING (o)),
         |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM it),
         |supp AS (SELECT p, CAST(count(*) AS BIGINT) AS c
         |         FROM it GROUP BY p),
         |pairs AS (
         |  SELECT a.p AS part_a, b.p AS part_b,
         |    CAST(count(*) AS BIGINT) AS pair_orders
         |  FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= $MinPairSupport)
         |SELECT part_a, part_b, pair_orders,
         |  sa.c AS orders_a, sb.c AS orders_b,
         |  CAST(pair_orders * n.n_orders AS DOUBLE) /
         |    CAST(sa.c * sb.c AS DOUBLE) AS lift,
         |  CAST(pair_orders AS DOUBLE) / CAST(sa.c AS DOUBLE) AS conf_ab
         |FROM pairs
         |JOIN supp sa ON pairs.part_a = sa.p
         |JOIN supp sb ON pairs.part_b = sb.p
         |CROSS JOIN n
         |ORDER BY pair_orders DESC, part_a, part_b
         |LIMIT $TopPairs""".stripMargin,

    "agg_pareto_orders" ->
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS od,
         |    ${centsSql("o_totalprice")} AS pc
         |  FROM orders),
         |d AS (SELECT od, max(pc) AS dmax FROM o GROUP BY od),
         |sky AS (
         |  SELECT od, dmax FROM d
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM d d2 WHERE d2.od > d.od AND d2.dmax >= d.dmax))
         |SELECT o.o_orderkey, o.od, o.pc / 100.0 AS price
         |FROM o JOIN sky ON o.od = sky.od AND o.pc = sky.dmax
         |ORDER BY o.o_orderkey""".stripMargin,

    "stat_chi_square" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT c_mktsegment, CAST(sum(o) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |          CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS r,
        |          CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS c
        |        FROM cells),
        |t AS (SELECT CAST(sum(o * o * 1000000000 // (rt.rt * ct.ct))
        |               AS BIGINT) AS t_sum
        |      FROM cells
        |      JOIN rt ON cells.c_mktsegment = rt.c_mktsegment
        |      JOIN ct ON cells.o_orderpriority = ct.o_orderpriority),
        |pre AS (
        |  SELECT n, (r - 1) * (c - 1) AS df,
        |    CAST(n * t_sum AS DOUBLE) / 1.0e9 - CAST(n AS DOUBLE) AS chi2,
        |    least(r - 1, c - 1) AS k
        |  FROM t, tot)
        |SELECT n, df, chi2,
        |  sqrt(chi2 / CAST(n * k AS DOUBLE)) AS cramers_v
        |FROM pre""".stripMargin,

    "stat_mann_whitney" ->
      s"""WITH g AS (
         |  SELECT ${centsSql("o_totalprice")} AS v,
         |    c_mktsegment = 'BUILDING' AS isA
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         |vc AS (
         |  SELECT v,
         |    CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
         |    CAST(count(*) AS BIGINT) AS t_v
         |  FROM g GROUP BY v),
         |cum AS (
         |  SELECT *, CAST(coalesce(sum(t_v) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS below
         |  FROM vc),
         |m AS (
         |  SELECT CAST(sum(na_v * (below * 2 + t_v + 1)) AS BIGINT) AS r2a,
         |    CAST(sum(na_v) AS BIGINT) AS na,
         |    CAST(sum(t_v) AS BIGINT) AS n,
         |    CAST(sum(t_v * t_v * t_v - t_v) AS BIGINT) AS ts
         |  FROM cum)
         |SELECT na AS n_a, n - na AS n_b,
         |  CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 AS u_a,
         |  CAST((r2a - na * (na + 1)) - na * (n - na) AS DOUBLE) /
         |    (2.0 * sqrt(CAST(na * (n - na) AS DOUBLE) / 12.0 *
         |      (CAST(n + 1 AS DOUBLE) -
         |        CAST(ts AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)))) AS z
         |FROM m""".stripMargin,

    "stat_hellinger_segments" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    ((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7)
        |      IN (0, 6) AS wkend
        |  FROM events),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN NOT wkend THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN wkend THEN 1 ELSE 0 END) AS BIGINT) AS e
        |  FROM ev GROUP BY event_type),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n1,
        |          CAST(sum(e) AS BIGINT) AS n2 FROM m),
        |terms AS (
        |  SELECT CAST(floor(sqrt(CAST(c * e AS DOUBLE) /
        |    CAST(n1 * n2 AS DOUBLE)) * 1.0e9) AS BIGINT) AS b_ppb
        |  FROM m, tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(b_ppb) AS DOUBLE) / 1.0e9 AS bhattacharyya,
        |  sqrt(1.0 - CAST(sum(b_ppb) AS DOUBLE) / 1.0e9) AS hellinger
        |FROM terms""".stripMargin,

    "sql_quantified_all" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > ALL (
        |  SELECT o2.o_totalprice
        |  FROM orders o2 JOIN customer ON o2.o_custkey = c_custkey
        |  WHERE c_mktsegment = 'AUTOMOBILE'
        |    AND o2.o_orderpriority = o.o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin)
}
