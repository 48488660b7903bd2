package graft.analytics

import graft.SparkSpec

/** Sketch-family error bounds. Since round 12 the opaque-sketch
  * queries emit oracle-checked bound CONTRACTS (exact side + inlined
  * ppm bound + within-bound booleans — changing their output shape
  * means changing their DuckDB oracles too); this spec asserts the
  * flags and numerically cross-checks one raw estimate per sketch so
  * the flag logic itself can't silently invert.
  */
class ScaleSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per channel") {
    // the 5% envelope now lives INSIDE the query (within_bound, the
    // oracle-checked contract column); the spec asserts every flag and
    // cross-checks one channel's raw estimate numerically so the flag
    // logic itself can't silently invert
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = ScaleQueries.queries("sketch_hll_users")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("exact_users") > 0)
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("event_type")} estimate outside 5%")
    }
    val probe = graft.Tables.events(spark, sf)
      .agg(countDistinct("user_id").as("e"),
        approx_count_distinct("user_id", 0.02).as("a")).collect()(0)
    assert(math.abs(probe.getLong(1) - probe.getLong(0)).toDouble /
      probe.getLong(0) <= 0.05)
  }

  test("manual HLL: registers merge by max; estimate sane, above the small-range cutoff") {
    val sf = "/root/testdata/sf0.001"
    val perType = ScaleQueries.queries("sketch_hll_manual")(spark, sf)
      .collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[Long]("bucket")),
        r.getAs[Long]("register"))).toMap
    assert(perType.nonEmpty)
    // mergeability by construction: the global register table must
    // equal the per-type tables max-merged (no rescan of events)
    val merged = perType.groupBy(_._1._2).map { case (b, m) => b -> m.values.max }
    val est = ScaleQueries.queries("sketch_hll_estimate")(spark, sf).collect()(0)
    val globalS = est.getAs[Long]("s_exact")
    val mergedS = (0L until ScaleQueries.HllM).map(b =>
      1L << (33 - merged.getOrElse(b, 0L)).toInt).sum
    assert(globalS == mergedS, s"max-merge mismatch: $globalS != $mergedS")
    val exact = est.getAs[Long]("exact_ids").toDouble
    val e = est.getAs[Double]("est_ids")
    // raw estimate must clear the 2.5m small-range cutoff so the
    // linear-counting branch (engine-variant ln()) never fires
    assert(e > 2.5 * ScaleQueries.HllM, s"estimate $e under linear-counting cutoff")
    // m=32 gives sigma = 1.04/sqrt(32) ~ 18%; 3 sigma envelope
    assert(math.abs(e - exact) / exact <= 0.55, s"est=$e exact=$exact")
  }

  test("bloom pre-join gate equals the plain semi-join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val gated = ScaleQueries.queries("sketch_bloom_prejoin")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val rich = graft.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val naive = graft.Tables.orders(spark, sf)
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        (sum(Exact.cents(col("o_totalprice"))) / 100.0).as("total_value"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(gated.toSeq == naive.toSeq)
    assert(gated.map(_._2).sum > 0, "gate must pass the true matches")
  }

  test("approx quantiles within 1% of exact per return flag") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    // the 1% envelope is the query's own contract column now; the spec
    // asserts every flag per quantile and numerically cross-checks one
    // (flag, quantile) pair so the flag logic can't silently invert
    val rows = ScaleQueries.queries("sketch_approx_quantiles")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; c <- Seq("p50_within", "p90_within", "p99_within"))
      assert(r.getAs[Boolean](c),
        s"${r.getAs[String]("l_returnflag")} $c outside 1%")
    val probe = graft.Tables.lineitem(spark, sf)
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("a"),
        expr("percentile(l_extendedprice, 0.5)").as("e")).collect()(0)
    assert(math.abs(probe.getDouble(0) - probe.getDouble(1)) /
      probe.getDouble(1) <= 0.01)
  }

  test("merged HLL sketches estimate the global distinct within 2%") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val r = ScaleQueries.queries("sketch_hll_merge")(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_sketches")
    val exact = r.getAs[Long]("exact_users")
    val sumTypes = r.getAs[Long]("sum_type_users")
    assert(n >= 2, "must merge at least two independent sketches")
    assert(sumTypes >= exact,
      "per-type counts double-count cross-type users — the merge must not")
    assert(r.getAs[Boolean]("merged_within_bound"),
      s"merged estimate outside 2% of exact=$exact")
    // numeric cross-check so the flag logic can't silently invert:
    // rebuild the merge directly and measure the error
    val est = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.02,
      s"merged estimate $est vs exact $exact")
  }

  test("bitmap distinct equals exact countDistinct") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val bm = ScaleQueries.queries("sketch_bitmap_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(bm.nonEmpty && bm.toSeq == exact.toSeq)
  }

  test("bin-blocked range join equals the naive theta join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val binned = ScaleQueries.queries("join_range_bins")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = graft.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"))
    val naive = p.join(c, col("user_id") === col("cu") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") < col("p_ts"), "left")
      .groupBy(col("event_id"), col("user_id"), col("p_ts"))
      .agg(count(col("cu")).as("n"))
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("p_ts")).as("p_sec"), col("n"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(binned.nonEmpty && binned.toSeq == naive.toSeq)
    assert(binned.exists(_._4 > 0), "fixture must contain attributed clicks")
  }

  test("count-min estimates only overestimate, within eps*N") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = ScaleQueries.queries("sketch_cms_terms")(spark, sf).collect()
    assert(rows.length == 10)
    val totalTokens = graft.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .count()
    // cross-check vs Spark's production CountMinSketch at the same
    // eps: both sketches only overestimate, so each top-10 estimate
    // must sit in [exact, exact + eps*N] — the hand-rolled xxhash64
    // sketch and the engine's binary one agree within the bound
    val bytes = graft.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .select(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    val builtin = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val epsN = math.ceil(0.001 * totalTokens).toLong
    for (r <- rows) {
      val exact = r.getAs[Long]("exact_n")
      val approx = r.getAs[Long]("approx_n")
      assert(approx >= exact, s"CMS must never underestimate: $r")
      assert(approx - exact <= epsN,
        s"CMS error beyond eps*N: $r (N=$totalTokens)")
      val b = builtin.estimateCount(r.getAs[String]("term"))
      assert(b >= exact && b - exact <= epsN,
        s"builtin CMS outside envelope: term=${r.getAs[String]("term")} b=$b exact=$exact")
    }
  }

  test("z-order buckets bound BOTH dimensions (the pruning-power property)") {
    val rows = ScaleQueries.queries("layout_zorder_stats")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // bucket = top 8 interleaved bits = top 4 bits of EACH 16-bit dim,
    // so within a bucket each dimension spans < 2^12 — a linear sort
    // key would bound one dimension and leave the other at full range
    for (r <- rows) {
      val uSpan = r.getAs[Long]("max_user") - r.getAs[Long]("min_user")
      val tSpan = r.getAs[Long]("max_t") - r.getAs[Long]("min_t")
      assert(uSpan < 4096 && tSpan < 4096,
        s"bucket ${r.getAs[Long]("bucket")}: spans $uSpan/$tSpan")
    }
  }

  test("salted join equals plain join and executes as a shuffled hash join") {
    import org.apache.spark.sql.functions._
    val q = ScaleQueries.queries("join_salted_skew")(
      spark, "/root/testdata/sf0.001")
    // the hint must survive planning: the whole point is the
    // shuffle-join shape (broadcast would sidestep the skew demo)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffled hash join in: $plan")
    val salted = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val plain = ev
      .withColumn("w", length(col("event_type")).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(Exact.cents(col("value")) * col("w")) / 100.0).as("wv"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted aggregation equals naive aggregation") {
    val salted = ScaleQueries.queries("agg_salted_hot_key")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val naive = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        Exact.moneySum(org.apache.spark.sql.functions.col("value")).as("v"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == naive.toSeq)
  }
}
