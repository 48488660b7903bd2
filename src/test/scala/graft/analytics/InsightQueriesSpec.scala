package graft.analytics

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row

/** Independent brute-force derivations for the decision-support suite:
  * each test recomputes the statistic from collected sf0.001 rows with
  * straight Scala (pairwise dominance, pairwise rank counting, naive
  * basket enumeration) — a different algorithm than the query's
  * distributed decomposition, so agreement pins the semantics, not
  * just the spelling. The DuckDB oracle gate separately pins the
  * spelling cross-engine.
  */
class InsightQueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    InsightQueries.queries(name)(spark, sf)

  test("agg_pareto_orders equals quadratic dominance scan") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_orderkey",
        "cast(floor(unix_timestamp(o_orderdate) / 86400) as long) as od",
        "cast(round(o_totalprice * 100) as long) as pc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sky = orders.filter { case (_, d, p) =>
      !orders.exists { case (_, d2, p2) =>
        d2 >= d && p2 >= p && (d2 > d || p2 > p) }
    }.map(_._1).toSet
    val got = q("agg_pareto_orders").collect().map(_.getLong(0)).toSet
    assert(got === sky)
    assert(got.nonEmpty)
  }

  test("stat_mann_whitney U equals pairwise count with half-ties") {
    val g = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .filter("c_mktsegment IN ('BUILDING', 'MACHINERY')")
      .selectExpr("cast(round(o_totalprice * 100) as long) as v",
        "c_mktsegment = 'BUILDING' as isA")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val a = g.filter(_._2).map(_._1)
    val b = g.filter(!_._2).map(_._1)
    // 2·U_A in exact integers: 2 per strict win, 1 per tie.
    val u2 = (for (x <- a; y <- b) yield
      if (x > y) 2L else if (x == y) 1L else 0L).sum
    val row = q("stat_mann_whitney").collect().head
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(row.getDouble(2) === u2.toDouble / 2.0)
    // z recomputed from the pairwise-derived U and tie spectrum.
    val n = a.length.toLong + b.length.toLong
    val ts = g.groupBy(_._1).map { case (_, rs) =>
      val t = rs.length.toLong; t * t * t - t }.sum
    val na = a.length.toLong; val nb = b.length.toLong
    val varU = na.toDouble * nb / 12.0 *
      ((n + 1).toDouble - ts.toDouble / (n.toDouble * (n - 1)))
    val z = (u2 - na * nb).toDouble / (2.0 * math.sqrt(varU))
    assert(math.abs(row.getDouble(3) - z) < 1e-12)
  }

  test("basket_pair_lift equals naive basket enumeration") {
    val items = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey as o", "l_partkey as p").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
      .filter(_._2.length <= 64)
    val nOrders = baskets.size.toLong
    val supp = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairCnt = baskets.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3L)
    val expect = pairCnt.toSeq.map { case ((pa, pb), c) =>
      (pa, pb, c, supp(pa), supp(pb),
        (c * nOrders).toDouble / (supp(pa) * supp(pb)).toDouble,
        c.toDouble / supp(pa).toDouble)
    }.sortBy { case (pa, pb, c, _, _, _, _) => (-c, pa, pb) }.take(200)
    val got = q("basket_pair_lift").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq === expect)
  }

  test("behavior_rfm_segments: quartile thresholds match sorted-rank pick") {
    val pc = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "cast(floor(unix_timestamp(o_orderdate) / 86400) as long) as od",
        "cast(round(o_totalprice * 100) as long) as pc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, rs) =>
        (c, rs.map(_._2).max, rs.size.toLong, rs.map(_._3).sum) }.toSeq
    val maxd = pc.map(_._2).max
    val n = pc.size
    def thr(vs: Seq[Long]): (Long, Long, Long) = {
      val s = vs.sorted
      def at(k: Int) = s(k - 1)
      (at((n + 3) / 4), at((n + 1) / 2), at((3 * n + 3) / 4))
    }
    def bucket(v: Long, t: (Long, Long, Long)): Long =
      1L + (if (v > t._1) 1L else 0L) + (if (v > t._2) 1L else 0L) +
        (if (v > t._3) 1L else 0L)
    val tR = thr(pc.map(maxd - _._2))
    val tF = thr(pc.map(_._3))
    val tM = thr(pc.map(_._4))
    val expect = pc.map { case (_, lastd, frq, mon) =>
      ((5L - bucket(maxd - lastd, tR), bucket(frq, tF), bucket(mon, tM)),
        mon)
    }.groupBy(_._1).map { case ((r, f, m), rs) =>
      (r, f, m, rs.size.toLong,
        rs.map(_._2).sum.toDouble / 100.0 / rs.size.toDouble)
    }.toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = q("behavior_rfm_segments").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === expect)
    assert(got.map(_._4).sum === n.toLong)
  }

  test("graph_resource_alloc equals naive wedge accumulation") {
    val cs = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("cast(o_custkey as long) as c",
        "cast(l_partkey as long) as sp")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = cs.groupBy(_._2).view.mapValues(_.map(_._1).sorted)
      .filter(_._2.length <= GraphQueries.MaxFanout).toMap
    val acc = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)]
    byPart.foreach { case (_, custs) =>
      val inv = 1000000000L / custs.length
      for (i <- custs.indices; j <- (i + 1) until custs.length) {
        val k = (custs(i), custs(j))
        val (nc, ra) = acc.getOrElse(k, (0L, 0L))
        acc(k) = (nc + 1L, ra + inv)
      }
    }
    val expect = acc.toSeq.collect {
      case ((a, b), (nc, ra)) if nc >= GraphQueries.MinCommon =>
        (a, b, nc, ra)
    }.sortBy { case (a, b, _, ra) => (-ra, a, b) }.take(100)
    val got = q("graph_resource_alloc").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
  }

  test("stat_hellinger_segments matches scalar recomputation and bounds") {
    val m = Tables.events(spark, sf).selectExpr("event_type",
      "((cast(floor(unix_timestamp(ts) / 86400) as long) + 4) % 7)" +
        " in (0, 6) as wkend")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val types = m.groupBy(_._1).view.mapValues { rs =>
      (rs.count(!_._2).toLong, rs.count(_._2).toLong) }.toMap
    val n1 = types.values.map(_._1).sum
    val n2 = types.values.map(_._2).sum
    val bSum = types.values.map { case (c, e) =>
      math.floor(math.sqrt((c * e).toDouble / (n1 * n2).toDouble) *
        1.0e9).toLong }.sum
    val row = q("stat_hellinger_segments").collect().head
    assert(row.getLong(0) === types.size.toLong)
    assert(row.getDouble(1) === bSum.toDouble / 1.0e9)
    assert(row.getDouble(2) === math.sqrt(1.0 - bSum.toDouble / 1.0e9))
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("stat_chi_square matches scalar recomputation") {
    val cells = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = cells.map(_._3).sum
    val tSum = cells.map { case (s0, p0, o) =>
      o * o * 1000000000L / (rt(s0) * ct(p0)) }.sum
    val chi2 = (n * tSum).toDouble / 1.0e9 - n.toDouble
    val k = math.min(rt.size, ct.size) - 1
    val row = q("stat_chi_square").collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === ((rt.size - 1) * (ct.size - 1)).toLong)
    assert(row.getDouble(2) === chi2)
    assert(row.getDouble(3) === math.sqrt(chi2 / (n * k).toDouble))
  }

  test("behavior_cumulative_users: last cumulative equals total distinct") {
    val rows = q("behavior_cumulative_users").collect()
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.last.getLong(2) === totalUsers)
    // monotone, and each step adds exactly new_users
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) === a.getLong(2) + b.getLong(1))
      assert(a.getLong(0) < b.getLong(0))
    case _ => ()
    }
    assert(rows.head.getLong(2) === rows.head.getLong(1))
  }

  test("text_source_affinity: identical-mix sources score near 1, " +
    "self-consistency bounds hold") {
    val rows = q("text_source_affinity").collect()
    assert(rows.length === 190) // C(20,2) source pairs
    rows.foreach { r =>
      val b = r.getDouble(3); val h = r.getDouble(4)
      assert(b > 0.0 && b <= 1.0)
      assert(h >= 0.0 && h < 1.0)
      assert(math.abs(h - math.sqrt(1.0 - b)) < 1e-15)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("ts_profile_cosine matches naive vectors") {
    val prof = Tables.events(spark, sf).selectExpr("event_type",
      "cast(floor(unix_timestamp(ts) / 3600) as long) % 24 as hr")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = prof.keys.map(_._1).toSeq.distinct.sorted
    def vec(t: String): Map[Long, Long] =
      (0L until 24L).map(h => h -> prof.getOrElse((t, h), 0L)).toMap
    val expect = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val (a, b) = (vec(types(i)), vec(types(j)))
      val dot = (0L until 24L).map(h => a(h) * b(h)).sum
      val na = a.values.map(x => x * x).sum
      val nb = b.values.map(x => x * x).sum
      (types(i), types(j), dot,
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
    }).filter(_._3 != 0L)
    val got = q("ts_profile_cosine").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // query emits only pairs with at least one co-occupied hour bin;
    // with 5 always-on types every pair co-occurs
    assert(got.toSeq === expect)
  }

  test("sql_quantified_all: every result beats the segment max of its " +
    "priority; vacuous priorities all pass") {
    val autoMax = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .filter("c_mktsegment = 'AUTOMOBILE'")
      .groupBy("o_orderpriority").agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.expr(
            "cast(round(o_totalprice * 100) as long)")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderpriority",
        "cast(round(o_totalprice * 100) as long) as pc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = all.filter { case (_, p, pc) =>
      autoMax.get(p).forall(pc > _) }.map(_._1).sorted
    val got = q("sql_quantified_all").collect().map(_.getLong(0))
    assert(got.toSeq === expect.toSeq)
  }

  test("ts_holt_linear equals scalar recursion") {
    val daily = Tables.events(spark, sf)
      .filter("value IS NOT NULL")
      .selectExpr("event_type",
        "cast(floor(unix_timestamp(ts) / 86400) as long) as od",
        "cast(round(value * 100) as long) as yc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues { rs =>
        rs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (_, g) => g.map(_._3).sum } }.toMap
    val expect = daily.map { case (t, ys) =>
      var l = ys.head.toDouble; var b = 0.0
      ys.tail.foreach { y =>
        val l2 = 0.5 * y.toDouble + 0.5 * (l + b)
        b = 0.5 * ((0.5 * y.toDouble + 0.5 * (l + b)) - l) + 0.5 * b
        l = l2
      }
      t -> (ys.size.toLong, l / 100.0, b / 100.0, (l + b) / 100.0)
    }
    val got = q("ts_holt_linear").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(got === expect)
  }

  test("stat_spearman_daily equals brute-force rank correlation") {
    val daily = Tables.events(spark, sf)
      .filter("value IS NOT NULL AND event_type IN ('click','purchase')")
      .selectExpr("cast(floor(unix_timestamp(ts) / 86400) as long) as od",
        "case when event_type = 'click' " +
          "then cast(round(value * 100) as long) else 0L end as x",
        "case when event_type = 'purchase' " +
          "then cast(round(value * 100) as long) else 0L end as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (_, rs) => (rs.map(_._2).sum, rs.map(_._3).sum) }
    def rank2(vs: Seq[Long]): Seq[Long] = {
      val sorted = vs.sorted
      vs.map { v =>
        val below = sorted.count(_ < v).toLong
        val t = sorted.count(_ == v).toLong
        2L * (below + 1L) + t - 1L // 2·minrank + t − 1
      }
    }
    val rx = rank2(daily.map(_._1)); val ry = rank2(daily.map(_._2))
    val n = daily.size.toLong
    val sx = rx.sum; val sy = ry.sum
    val sxx = rx.map(v => v * v).sum; val syy = ry.map(v => v * v).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val rho = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    val row = q("stat_spearman_daily").collect().head
    assert(row.getLong(0) === n)
    assert(row.getDouble(1) === rho)
    assert(math.abs(row.getDouble(1)) <= 1.0)
  }

  test("stat_kendall_daily equals brute-force concordance count") {
    val daily = Tables.events(spark, sf)
      .filter("value IS NOT NULL AND event_type IN ('click','purchase')")
      .selectExpr("cast(floor(unix_timestamp(ts) / 86400) as long) as od",
        "case when event_type = 'click' " +
          "then cast(round(value * 100) as long) else 0L end as x",
        "case when event_type = 'purchase' " +
          "then cast(round(value * 100) as long) else 0L end as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (_, rs) => (rs.map(_._2).sum, rs.map(_._3).sum) }
    var nc = 0L; var nd = 0L; var n1 = 0L; var n2 = 0L; var n0 = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.size) {
      val (xi, yi) = daily(i); val (xj, yj) = daily(j)
      n0 += 1
      if (xi == xj) n1 += 1
      if (yi == yj) n2 += 1
      val p = (xi - xj) * (yi - yj)
      if (p > 0) nc += 1 else if (p < 0) nd += 1
    }
    val tau = (nc - nd).toDouble /
      (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble))
    val row = q("stat_kendall_daily").collect().head
    assert(row.getLong(0) === nc)
    assert(row.getLong(1) === nd)
    assert(row.getDouble(2) === tau)
  }

  test("dq_uniqueness_report: primary keys flagged, ppm consistent") {
    val rows = q("dq_uniqueness_report").collect()
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(byName("orders.o_orderkey")._4)
    assert(byName("customer.c_custkey")._4)
    assert(byName("events.event_id")._4)
    assert(byName("documents.doc_id")._4)
    // the synthetic lineitem REUSES line numbers within an order
    // (unlike real TPC-H) — the profiler must surface that, not
    // assume the textbook key
    assert(!byName("lineitem.l_orderkey_l_linenumber")._4)
    assert(!byName("orders.o_custkey")._4)
    assert(!byName("events.user_id")._4)
    byName.values.foreach { case (n, nd, ppm, isKey) =>
      assert(ppm === nd * 1000000L / n)
      assert(isKey === (nd === n))
    }
  }

  test("ts_holt_winters equals a straight Scala fold, bit-for-bit") {
    val daily = Tables.events(spark, sf)
      .filter("value IS NOT NULL")
      .selectExpr("event_type",
        "cast(floor(unix_timestamp(ts) / 86400) as long) as od",
        "cast(round(value * 100) as long) as yc")
      .groupBy("event_type", "od")
      .agg(org.apache.spark.sql.functions.expr("sum(yc) as yc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3.toDouble)).toMap
    val got = q("ts_holt_winters").collect().map(r =>
      r.getString(0) -> r).toMap
    assert(got.keySet == daily.keySet)
    for ((et, ys) <- daily) {
      var l = ys.head; var b = 0.0
      val sArr = Array.fill(7)(0.0)
      var i = 1
      for (y <- ys.tail) {
        val slot = i % 7
        val lNew = 0.5 * (y - sArr(slot)) + 0.5 * (l + b)
        val bNew = 0.5 * (lNew - l) + 0.5 * b
        sArr(slot) = 0.5 * (y - lNew) + 0.5 * sArr(slot)
        l = lNew; b = bNew; i += 1
      }
      val r = got(et)
      assert(r.getLong(r.fieldIndex("n_days")) == ys.size.toLong)
      assert(r.getDouble(r.fieldIndex("level")) == l / 100.0, et)
      assert(r.getDouble(r.fieldIndex("trend")) == b / 100.0, et)
      assert(r.getDouble(r.fieldIndex("forecast")) ==
        (l + b + sArr(i % 7)) / 100.0, et)
    }
  }

  test("stat_permutation_test: a planted one-sided shift is maximally significant") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_perm").toString
    // 30 days, clicks worth 100, views worth 1 -> every daily
    // difference is strongly positive; no sign-flip pattern (short of
    // the all-equal-signs one, probability ~2^-29 per resample under
    // the hash) can reach |T_obs|, so n_ge = 0 and p = 1/201
    val rows = for {
      day <- 0 until 30
      (et, v, k) <- Seq(("click", 100.0, 0L), ("view", 1.0, 1L))
    } yield (day.toLong * 2 + k, java.sql.Timestamp.valueOf(
      s"2024-01-${"%02d".format(day % 28 + 1)} 0${day % 9}:00:00"),
      day.toLong, et, v, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    val r = InsightQueries.queries("stat_permutation_test")(spark, dir)
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_ge")) == 0L)
    assert(r.getLong(r.fieldIndex("p_ppm")) == 1000000L / 201L)
  }
}
