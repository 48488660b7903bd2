package graft.analytics

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.col

/** Degenerate-input coverage for queries that pre-compute driver-side
  * bounds: an EMPTY orders table must yield an empty result, not a
  * crash (the recursive spine reads min/max before building its SQL).
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  test("sql_recursive_spine on an empty orders table mirrors the oracle's NULL anchor row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Seq.empty[(Long, Long, String, Double, java.sql.Date, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("sql_recursive_spine")(spark, dir)
    assert(out.columns.toSeq == Seq("month", "n_orders"))
    // the oracle's recursive anchor on empty input emits one NULL-month
    // row that survives the LEFT JOIN as (NULL, 0) — exact mirror
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).isNullAt(0) && rows(0).getLong(1) == 0L)
  }

  test("pivot_unpivot_roundtrip survives an empty orders table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty2").toString
    Seq.empty[(Long, Long, String, Double, java.sql.Date, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("pivot_unpivot_roundtrip")(spark, dir)
    assert(out.columns.toSeq ==
      Seq("o_orderpriority", "o_orderstatus", "n_orders"))
    assert(out.count() == 0)
  }

  test("segment dedup, BPE and PQ queries survive empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty3").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    for (q <- Seq("dedup_segment_groups", "dedup_segment_scrub",
        "text_bpe_vocab", "text_bpe_encode",
        "sim_pq_codes", "sim_pq_adc_topk",
        // pps now sizes its bucket width from a driver-side count/max
        // pre-pass — the max is NULL on an empty corpus (width
        // falls back to 1) and the nullif-folded step drops every row
        "sample_pps_systematic",
        // Simpson: empty token table → empty lang moments → empty
        "text_simpson_diversity",
        // novelty: no docs → no trigrams → empty owner join
        "text_ngram_novelty")) {
      val out = SparkEntry.queries(q)(spark, dir)
      assert(out.count() == 0L, s"$q must be empty, not crash")
    }
  }

  test("k-means, fuzzy, phash, PageRank and window queries survive empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty4").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    Seq.empty[(Long, String)]
      .toDF("c_custkey", "c_name")
      .repartition(1).write.parquet(s"$dir/customer.parquet")
    Seq.empty[(Long, Long)]
      .toDF("o_orderkey", "o_custkey")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Long)]
      .toDF("l_orderkey", "l_suppkey")
      .repartition(1).write.parquet(s"$dir/lineitem.parquet")
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    // sim_kmeans_moves still emits its per-round rows (aggregates
    // without GROUP BY yield one row even on empty input — exactly
    // like the oracle's UNION ALL arms), so it is asserted separately
    for (q <- Seq("sim_kmeans_train", "sim_ivf_trained_topk",
        "dedup_semantic_trained", "sim_silhouette",
        "dedup_fuzzy_names", "multimodal_phash", "multimodal_phash_dups",
        "text_pmi_collocations", "text_vocab_coverage",
        "behavior_seq2_support",
        "graph_pagerank_top", "window_session_native",
        "window_tumbling_native", "window_sliding_native",
        "cdc_point_in_time")) {
      val out = SparkEntry.queries(q)(spark, dir)
      assert(out.count() == 0L, s"$q must be empty, not crash")
    }
    val moves = SparkEntry.queries("sim_kmeans_moves")(spark, dir).collect()
    assert(moves.length == 3 && moves.forall(_.getLong(1) == 0L))
    val bal = SparkEntry.queries("sim_kmeans_balance")(spark, dir).collect()
    assert(bal.length == 2 && bal.forall(_.getLong(1) == 0L))
  }

  test("round-7 profile/drift/percentile queries survive an empty events table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty5").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    for (q <- Seq("stat_percentile_cont", "ts_cusum_changepoint",
        "ts_autocorrelation", "ts_seasonality_profile", "stat_theil_sen",
        "dq_distribution_drift", "dq_freshness", "stat_welch_ttest",
        "window_rolling_median", "window_max_drawdown",
        "asof_nearest_click", "asof_prev_click_tol")) {
      val out = SparkEntry.queries(q)(spark, dir)
      assert(out.count() == 0L, s"$q must be empty, not crash")
    }
    // the column profile keeps one row per profiled column (global
    // aggregates yield a row on empty input), all zeros
    val prof = SparkEntry.queries("dq_null_profile")(spark, dir).collect()
    assert(prof.length == 6 && prof.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("round-7b additions survive empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty6").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    Seq.empty[(Long, Long, String, Double, java.sql.Date, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Long, Long, Double, Double, java.sql.Date, String, String)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_shipdate", "l_returnflag", "l_linestatus")
      .repartition(1).write.parquet(s"$dir/lineitem.parquet")
    for (q <- Seq("ts_mase_naive", "ts_classical_decompose",
        "window_ohlc_hourly", "stat_bootstrap_ci", "text_ccnet_buckets",
        "text_source_overlap", "dedup_cluster_size_hist",
        "sim_radius_search", "graph_kcore")) {
      val out = SparkEntry.queries(q)(spark, dir)
      assert(out.count() == 0L, s"$q must be empty, not crash")
    }
    // the sweep keeps one row per threshold (global aggregate), zeros
    val sweep = SparkEntry.queries("text_filter_sweep")(spark, dir)
      .collect()
    assert(sweep.length == 5 && sweep.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L &&
        r.getLong(3) == 0L && r.getLong(4) == 0L))
    // assortativity degenerates to a single all-null-moment row
    val as = SparkEntry.queries("graph_assortativity")(spark, dir)
      .collect()
    assert(as.length == 1 && as(0).getLong(0) == 0L)
  }

  test("round-7c additions survive empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty7").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    for (q <- Seq("text_fertility_by_lang", "text_zipf_constancy",
        "behavior_lifetime_survival", "sample_group_split", "text_mattr",
        "stat_effect_sizes", "ts_holt_winters", "sim_centroid_drift",
        "text_burstiness", "ts_anomaly_residual",
        "stat_higher_moments")) {
      val out = SparkEntry.queries(q)(spark, dir)
      assert(out.count() == 0L, s"$q must be empty, not crash")
    }
    // the order ablation keeps its two global-census rows, zeroed
    val oa = SparkEntry.queries("curation_order_ablation")(spark, dir)
      .collect()
    assert(oa.length == 2 && oa.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L))
    // the lateness grid keeps one row per candidate delay (global
    // aggregate), all counters zero under the total=0 guard
    val wm = SparkEntry.queries("dq_watermark_lateness")(spark, dir)
      .collect()
    assert(wm.length == 3 && wm.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L))
    // Brown–Forsythe degenerates to a single all-null row (global
    // aggregate over zero groups, guards trip)
    val bf = SparkEntry.queries("stat_brown_forsythe")(spark, dir)
      .collect()
    assert(bf.length == 1 && bf(0).isNullAt(6) && bf(0).isNullAt(7))
    // the permutation test keeps one zero-count row with NULL p
    val pt = SparkEntry.queries("stat_permutation_test")(spark, dir)
      .collect()
    assert(pt.length == 1 && pt(0).getLong(0) == 0L && pt(0).isNullAt(3))
    // the fan-out estimator keeps only its zeroed summary row
    val fo = SparkEntry.queries("dq_join_fanout_estimate")(spark, dir)
      .collect()
    assert(fo.length == 1 && fo(0).isNullAt(0) && fo(0).getLong(2) == 0L)
    Seq.empty[(Long, String)].toDF("c_custkey", "c_name")
      .repartition(1).write.parquet(s"$dir/customer.parquet")
    Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
      .repartition(1).write.parquet(s"$dir/lineitem.parquet")
    Seq.empty[(Long, String)].toDF("p_partkey", "p_name")
      .repartition(1).write.parquet(s"$dir/part.parquet")
    // all four inclusion rows survive with zero counts, no candidate
    val inc = SparkEntry.queries("dq_inclusion_deps")(spark, dir)
      .collect()
    assert(inc.length == 4 && inc.forall(r =>
      r.getLong(1) == 0L && r.getLong(3) == 0L && !r.getBoolean(4)))
  }

  test("pivot_unpivot_roundtrip derives the status domain from the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dyn").toString
    // a status outside the usual {F, O, P} domain must survive
    Seq((1L, 10L, "X", 5.0, java.sql.Date.valueOf("2024-01-03"), "1-URGENT"),
      (2L, 11L, "O", 7.5, java.sql.Date.valueOf("2024-02-04"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("pivot_unpivot_roundtrip")(spark, dir)
      .select("o_orderpriority", "o_orderstatus", "n_orders")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("1-URGENT", "X", 1L), ("2-HIGH", "O", 1L)))
  }

  test("retrieval/eval/markov queries with driver-side bounds survive empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty6").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    Seq.empty[(Long, Long)]
      .toDF("o_orderkey", "o_custkey")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Long, Long)]
      .toDF("l_orderkey", "l_suppkey", "l_partkey")
      .repartition(1).write.parquet(s"$dir/lineitem.parquet")
    for (q <- Seq("sim_mmr_topk", "sim_rrf_fusion", "sim_ndcg_eval",
        "sim_map_eval", "text_bm25_topk", "sample_balanced_lang",
        "behavior_markov_eval", "graph_local_clustering",
        "text_langid_kappa")) {
      val out = SparkEntry.queries(q)(spark, dir)
      // queries built on no-GROUP-BY global aggregates (kappa) keep
      // their single summary row; everything else must be empty
      val n = out.count()
      assert(n == 0L || q == "text_langid_kappa",
        s"$q must be empty on empty input, got $n rows")
    }
  }

  test("round-8 additions survive empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty9").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Long, String, Double, java.sql.Date, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, String, Long)]
      .toDF("c_custkey", "c_mktsegment", "c_nationkey")
      .repartition(1).write.parquet(s"$dir/customer.parquet")
    Seq.empty[(Long, Long, Long, Double, Double, Double, Double)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .repartition(1).write.parquet(s"$dir/lineitem.parquet")
    for (q <- Seq("graph_closeness_panel", "graph_betweenness_panel",
        "curation_pareto_skyline", "behavior_pattern_regex",
        "agg_decayed_revenue", "stat_jackknife", "mv_join_delta",
        "ts_sax_motifs", "window_trailing_distinct_users",
        "window_hampel_outliers", "stat_median_ci", "stat_wilson_ci",
        "behavior_attribution_models")) {
      val out = SparkEntry.queries(q)(spark, dir)
      assert(out.count() == 0L, s"$q must be empty, not crash")
    }
    // l-diversity keeps its two global-census rows (aggregates without
    // GROUP BY), zero groups each
    val ldiv = SparkEntry.queries("dq_l_diversity")(spark, dir).collect()
    assert(ldiv.length == 2 && ldiv.forall(_.getLong(1) == 0L))
    // LTV curve joins empty cohort tables → empty
    assert(SparkEntry.queries("cohort_ltv_curve")(spark, dir)
      .count() == 0L)
    // Benford: empty census → empty type-total table → the digit
    // grid has no types to cross — empty, not a divide-by-zero
    assert(SparkEntry.queries("dq_benford")(spark, dir).count() == 0L)
    // Mann–Kendall: empty events → empty daily table → empty tie
    // census drives the left join — empty, no float div-by-zero
    assert(SparkEntry.queries("stat_mann_kendall")(spark, dir)
      .count() == 0L)
    // capture–recapture keeps its single global row: zero counts,
    // NULL Lincoln–Petersen (m = NULL guard path)
    val cr = SparkEntry.queries("stat_capture_recapture")(spark, dir)
      .collect()
    assert(cr.length == 1 && cr(0).getLong(3) == 0L)
    // the PCA moments row survives (global aggregate) with n = 0 and
    // NULL eigenpair — the oracle's empty-sum NULL propagation; the
    // DECIMAL twin must degrade identically (same plan, same NULLs)
    for (q <- Seq("stat_pca_power", "stat_pca_power_decimal")) {
      val pca = SparkEntry.queries(q)(spark, dir).collect()
      assert(pca.length == 1 && pca(0).getLong(0) == 0L &&
        pca(0).isNullAt(1), s"$q empty-input row")
    }
    // ridge keeps one row per lambda, all-NULL betas (det = NULL path)
    val ridge = SparkEntry.queries("stat_ridge_path")(spark, dir).collect()
    assert(ridge.length == StatQueries.RidgeLambdas.size &&
      ridge.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
  }
}
