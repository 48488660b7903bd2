package graft.analytics

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** Scale-technique demonstrations with oracle-verified equivalence:
  * the point of each query is that the OPTIMIZED dataflow produces
  * bit-identical results to the naive one the oracle computes.
  */
object ScaleQueries extends QuerySuite {

  val Salts = 16

  /** Dictionary-encoding verdict: recommend when distinct values are
    * at most 1/DictMaxRatio of the rows (the parquet-writer
    * dictionary-page heuristic, integer-exact). */
  val DictMaxRatio = 20L

  /** Hand-rolled CMS shape: d rows × w counters (eps = 2/w ≈ 0.001). */
  val CmsDepth = 4
  val CmsWidth = 2048

  /** Compaction output-bin target for layout_compaction_plan. 4 KB
    * against the testdata's ~0.5–5 KB simulated files exercises the
    * same many-files-per-bin / many-bins-per-source geometry a
    * 128 MB target meets in production manifests. */
  val CompactTargetBytes = 4096L

  /** Hand-rolled HLL: m = 2^5 registers; rho reads the top 32 bits
    * below the bucket index so register sums stay exact in LONG
    * arithmetic (max term 2^33, sum ≤ m·2^33 ≪ 2^63). alpha_32 from
    * Flajolet et al. AOFA'07. */
  val HllP = 5
  val HllM = 32
  val HllAlpha = 0.697

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Skew-safe aggregation by salting: a hot key (every event lands in
    // one of 5 channels; 'purchase'-like keys dominate) is pre-split
    // into `Salts` shards, partially aggregated, then merged — the
    // two-stage pattern for keys too hot for one reducer. The oracle is
    // the naive single-stage groupBy: results must match exactly, which
    // the integer-cents sums guarantee.
    "agg_salted_hot_key" -> ((s, d) => {
      val salted = Tables.events(s, d)
        .withColumn("salt", col("event_id") % Salts)
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("v"))
      salted.groupBy("event_type")
        .agg(sum("n").as("n_events"), (sum("v") / 100.0).as("total_value"))
        .orderBy("event_type")
    }),

    // Sketch-based distinct counting (HLL++): approximate per-channel
    // user counts checked against the exact answer INSIDE the query —
    // the estimate itself is engine-specific, so the output row is the
    // deterministic contract (key, exact, bound, within_bound) and the
    // DuckDB oracle replays the exact side with a TRUE literal. The
    // bound test is multiplication-only (|approx−exact| ≤ bound·exact)
    // so a zero-cardinality group can never divide by zero; exact = 0
    // degenerates to "estimate must be 0 too". rsd = 0.02, bound = 5%
    // (2.5σ) — the same envelope ScaleSpec has pinned since round 1.
    "sketch_hll_users" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users"),
          approx_count_distinct("user_id", 0.02).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          lit(50000L).as("rel_err_ppm_bound"),
          when(col("exact_users") === 0L,
            coalesce(col("approx_users"), lit(0L)) === 0L)
            .otherwise(
              abs(col("approx_users").cast("double") -
                col("exact_users").cast("double")) <=
                lit(0.05) * col("exact_users").cast("double"))
            .as("within_bound"))
        .orderBy("event_type")),

    // Bloom-filter pre-join gate: build a bloom filter over the SMALL
    // side's keys (rich customers — same cost class as a broadcast),
    // prefilter the fact scan map-side with might-contain, then run
    // the exact semi-join on the survivors. False positives are
    // removed by the exact join, so the result is bit-identical to
    // the plain semi-join the oracle computes — while at 100 TB the
    // prefilter cuts the fact rows entering the shuffle to roughly
    // the join's selectivity (the hand-rolled twin of Spark's own
    // runtime row-level filtering, here made explicit and testable).
    "sketch_bloom_prejoin" -> ((s, d) => {
      val rich = Tables.customer(s, d)
        .filter(col("c_acctbal") > 9000).select("c_custkey")
      // an EMPTY build side leaves Spark's aggregated BloomFilter
      // with a NULL bit buffer — every method on it (mightContain,
      // even bitSize) NPEs — so probe emptiness FIRST (one action on
      // the dim-sized side, the pps-sizing discipline); an empty set
      // contains nothing and the gate is constant-false (the semi
      // join below yields the same empty answer either way)
      val mightContain =
        if (rich.isEmpty) udf((_: Long) => false)
        else {
          val bloom = rich.stat.bloomFilter("c_custkey", 10000L, 0.01)
          udf((k: Long) => bloom.mightContain(k))
        }
      Tables.orders(s, d)
        .filter(mightContain(col("o_custkey")))
        .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))) / 100.0).as("total_value"))
        .orderBy("o_orderstatus")
    }),

    // Count-min-sketch heavy-hitter estimation — the fourth sketch
    // next to HLL (distinct), bloom (membership) and KLL (quantiles):
    // a fixed-size mergeable frequency summary (Cormode & Muthukrishnan
    // J.Alg'05) built in ONE pass with map-side partial merges: each
    // token occurrence increments d=4 counters at
    // pmod(xxhash64(term∥'#'∥row), w=2048); partial aggregation caps
    // the shuffle at d·w rows per partition no matter the corpus size,
    // and counters merge by plain +. Estimates = min over the d rows;
    // they only ever overestimate, by at most (2/w)·N with confidence
    // 1−(1/2)^d. Hand-rolled on xxhash64 (not Spark's opaque
    // count_min_sketch binary — ScaleSpec compares against it) exactly
    // so the DuckDB oracle can replay every counter via XxhSql and the
    // driver hash-checks the whole sketch, not just its shape.
    "sketch_cms_terms" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("term"))
      val exact = tok.groupBy("term").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("term")).limit(10)
      val rows = explode(array((0 until CmsDepth).map(lit(_)): _*)).as("row")
      val bucket = pmod(
        xxhash64(concat(col("term"), lit("#"), col("row"))), lit(CmsWidth))
      val counters = tok.select(col("term"), rows)
        .withColumn("bucket", bucket)
        .groupBy("row", "bucket").agg(count(lit(1)).as("counter"))
      exact.select(col("term"), col("exact_n"), rows)
        .withColumn("bucket", bucket)
        .join(broadcast(counters), Seq("row", "bucket"))
        .groupBy("term", "exact_n").agg(min("counter").as("approx_n"))
        .orderBy(col("exact_n").desc, col("term"))
    }),

    // Approximate quantiles (KLL-style percentile_approx sketch): the
    // mergeable one-pass scale path next to the exact rank-selection
    // percentiles of agg_percentiles_disc. The sketch values are
    // engine-specific, so the output is the deterministic contract:
    // per flag, the row count and one within-1% boolean per quantile
    // (|approx−exact| ≤ 0.01·exact, multiplication-only — prices are
    // positive so exact > 0 whenever a group exists; exact = 0 would
    // degenerate to approx = 0). The DuckDB twin replays the counts
    // and TRUE literals. Exact percentiles come from the same
    // aggregate pass (no second scan).
    "sketch_approx_quantiles" -> ((s, d) => {
      def within(a: org.apache.spark.sql.Column,
          e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(e === 0.0, coalesce(a, lit(0.0)) === 0.0)
          .otherwise(abs(a - e) <= lit(0.01) * abs(e))
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000))
          .as("approx_pcts"),
          expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
            .as("exact_pcts"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("n_rows"),
          lit(10000L).as("rel_err_ppm_bound"),
          within(col("approx_pcts").getItem(0),
            col("exact_pcts").getItem(0)).as("p50_within"),
          within(col("approx_pcts").getItem(1),
            col("exact_pcts").getItem(1)).as("p90_within"),
          within(col("approx_pcts").getItem(2),
            col("exact_pcts").getItem(2)).as("p99_within"))
        .orderBy("l_returnflag")
    }),

    // Sketch MERGEABILITY — the property that makes sketches the scale
    // answer: one HLL sketch per event_type (built independently, as
    // shards would), then hll_union_agg merges the sketches and
    // estimates the GLOBAL distinct count without ever rescanning rows
    // — a 100 TB rollup reuses per-partition/per-day sketches instead
    // of a second global pass. The merged estimate is engine-specific,
    // so the output is the deterministic contract: the replayable
    // exact sides (sketch count, global exact, double-counting sum)
    // plus a within-2% boolean on the merged estimate
    // (multiplication-only; exact = 0 degenerates to estimate = 0).
    // The DuckDB twin replays the exact columns and a TRUE literal.
    "sketch_hll_merge" -> ((s, d) => {
      val perType = Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("hll_sketch_agg(user_id)").as("sk"),
          countDistinct("user_id").as("type_users"))
      val exact = Tables.events(s, d)
        .agg(countDistinct("user_id").as("exact_users"))
      perType.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged_est"),
          count(lit(1)).as("n_sketches"),
          sum("type_users").as("sum_type_users"))
        .crossJoin(exact)
        .select(col("n_sketches"), col("exact_users"),
          coalesce(col("sum_type_users"), lit(0L)).as("sum_type_users"),
          lit(20000L).as("rel_err_ppm_bound"),
          when(col("exact_users") === 0L,
            coalesce(col("merged_est"), lit(0L)) === 0L)
            .otherwise(
              abs(col("merged_est").cast("double") -
                col("exact_users").cast("double")) <=
                lit(0.02) * col("exact_users").cast("double"))
            .as("merged_within_bound"))
    }),

    // Hand-rolled HLL registers, per event_type — the glass-box twin
    // of sketch_hll_users/merge (which use the engine's opaque
    // DataSketches binaries). Target: distinct event_id — the
    // dedup-under-at-least-once-delivery counter (and, unlike the
    // 15-user sf0.001 fixture, large enough that the raw estimator
    // regime applies at every sf). bucket = top HllP bits of
    // xxhash64(event_id), register = max over the group of
    // rho = 1 + leading-zero count of the next 32 bits. groupBy+max
    // partial-aggregates map-side, so the shuffle carries ≤ types·m
    // rows regardless of event count, and registers merge by MAX —
    // mergeability by construction. Every register is integer
    // arithmetic the DuckDB oracle replays exactly (XxhSql), so the
    // whole sketch state is hash-checked.
    "sketch_hll_manual" -> ((s, d) => {
      val grid = Tables.events(s, d).select("event_type").distinct()
        .crossJoin(s.range(HllM.toLong).select(col("id").as("bucket")))
      grid.join(hllRegisters(s, d), Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"),
          coalesce(col("register"), lit(0L)).as("register"))
        .orderBy("event_type", "bucket")
    }),

    // ...and the estimate from MERGED registers: per-type register
    // tables max-merge into a global one (never rescanning events),
    // then the standard estimator alpha·m²/Σ2^−M_j — computed over the
    // EXACT integer register sum S = Σ2^(33−M_j) so both engines
    // divide the same two exact numbers (no float accumulation drift).
    // The fixture keeps the raw estimate above the 2.5m small-range
    // cutoff at every sf (ScaleSpec asserts it), so the
    // linear-counting branch — whose ln() could differ in the last
    // ulp between engines — never fires.
    "sketch_hll_estimate" -> ((s, d) => {
      val merged = hllRegisters(s, d)
        .groupBy("bucket").agg(max("register").as("register"))
      val sumS = merged.agg(
        (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - register AS INT))")) +
          (lit(HllM) - count(lit(1))) * lit(1L << 33)).as("s_exact"),
        count(lit(1)).as("nonzero_registers"))
      val exact = Tables.events(s, d)
        .agg(countDistinct("event_id").as("exact_ids"))
      sumS.crossJoin(exact).select(
        col("exact_ids"), col("nonzero_registers"),
        col("s_exact"),
        (lit(HllAlpha * HllM * HllM) * lit((1L << 33).toDouble) /
          col("s_exact").cast("double")).as("est_ids"))
    }),

    // Bitmap-exact distinct counting: the scale companion to
    // sketch_hll_users that stays EXACT. user ids are mapped to
    // (bucket, bit) coordinates, each (key, bucket) group folds into a
    // fixed-size bitmap map-side (bitmap_construct_agg partial-aggregates
    // like any agg), buckets merge by popcount sum. The shuffle carries
    // one ≤4KB bitmap per (key, bucket), never raw ids — at 10⁹ users
    // per key that is ~32K bitmaps instead of 10⁹ longs. The DuckDB
    // oracle is the naive count(DISTINCT): results match exactly.
    "sketch_bitmap_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bkt"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy("event_type", "bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        .groupBy("event_type")
        .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
        .orderBy("event_type")),

    // Bin-blocked range join: clicks attributed to a purchase by the
    // same user within the preceding 30 minutes. The naive plan is a
    // theta-join (user equality + timestamp range) that Spark executes
    // as a broadcast nested loop — quadratic per user at scale. The
    // scale shape blocks time into 30-minute bins: each click keys to
    // its own bin, each purchase probes its bin and the one before, so
    // the range predicate only runs inside (user, bin) equi-join
    // groups. Bit-identical to the oracle's plain non-equi join because
    // a qualifying pair is never more than one bin apart and each click
    // carries exactly one bin key (no dedup needed).
    "join_range_bins" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val binSec = 1800L
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
          expr(s"unix_timestamp(ts) div $binSec").as("p_bin"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          expr(s"unix_timestamp(ts) div $binSec").as("bin"))
      val probed = purchases
        .withColumn("bin", explode(array(col("p_bin") - 1, col("p_bin"))))
      val matched = probed
        .join(clicks, probed("user_id") === clicks("c_user") &&
          probed("bin") === clicks("bin"))
        .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") < col("p_ts"))
        .groupBy("event_id").agg(count(lit(1)).as("n"))
      purchases.join(matched, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("p_ts")).as("p_sec"),
          coalesce(col("n"), lit(0L)).as("n_prior_clicks"))
        .orderBy("event_id")
    }),

    // Skew-safe SHUFFLE join by salting: the fact keys on 5 hot event
    // types, so a plain shuffle join lands each type on ONE reducer —
    // 5-way parallelism no matter how many executors. Salting splits
    // every hot key into `Salts` shards: the fact adds
    // salt = event_id % Salts, the dim side is replicated Salts×, and
    // the join runs on (key, salt) with Salts× the reduce parallelism.
    // The shuffle_hash hint forces the shuffle-join shape the query
    // exists to demonstrate (this demo dim is small enough that
    // Catalyst would otherwise broadcast it and sidestep the skew —
    // the salt pattern is for dims too big to broadcast). The oracle
    // is the plain unsalted join; integer-cents weighting keeps the
    // result bit-identical.
    "join_salted_skew" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("salt", (col("event_id") % Salts).cast("int"))
      val dim = Tables.events(s, d).select("event_type").distinct()
        .withColumn("w", length(col("event_type")).cast("long"))
      val saltedDim = dim.withColumn("salt",
        explode(array((0 until Salts).map(i => lit(i)): _*)))
      ev.join(saltedDim.hint("shuffle_hash"), Seq("event_type", "salt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          (sum(cents(col("value")) * col("w")) / 100.0).as("weighted_value"))
        .orderBy("event_type")
    }),

    // Z-order layout planning: interleave the bits of two scan
    // dimensions (user, time) into one sort key, bucket by its prefix,
    // and report per-bucket dimension ranges — the multi-dimensional
    // clustering step behind data-layout optimization (writing files
    // in z-order makes min/max file stats selective on BOTH columns,
    // so a 100 TB scan prunes on either predicate; a plain sort is
    // selective on one). The bit math is exact integer arithmetic,
    // generated once and rendered identically for both engines; the
    // oracle hash-proves the layout assignment is reproducible. The
    // tight per-bucket min/max spans in the output are the pruning
    // power a writer would get.
    // Write-layout planner: per source shard, the file count a 128 MB
    // target implies for the TEXT payload and the skew ratio against
    // the mean shard — the numbers that decide repartition() before a
    // corpus lands on object storage (one giant shard → one straggler
    // writer; thousands of tiny ones → small-files problem). Byte
    // estimate is the exact n_chars sum; ratios in integer ppm.
    "layout_partition_stats" -> ((s, d) => {
      val bySrc = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
      val tot = bySrc.agg(sum("bytes").as("total_bytes"),
        count(lit(1)).as("n_sources"), max("bytes").as("max_bytes"))
      bySrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("bytes"),
          ceil(col("bytes").cast("double") / 134217728.0).cast("long")
            .as("target_files"),
          // loud headroom guard: bytes·n_sources·10⁶ reaches ~10²³ at
          // the 100 TB design point this query exists to plan for —
          // exactly where an unguarded product would abort (ANSI) or
          // wrap (non-ANSI); max_bytes·n_sources·10⁶ bounds it from
          // wrap-proof aggregates
          Exact.momentGuard(s, "layout_partition_stats",
            "max_bytes*n_sources*1e6",
            col("max_bytes").cast("double") *
              col("n_sources").cast("double") * lit(1.0e6))(
            expr("bytes * n_sources * 1000000 div nullif(total_bytes, 0)"))
            .as("vs_mean_ppm"))
        .orderBy("source")
    }),

    // Equi-depth histogram boundaries — the optimizer-statistics
    // artifact (DuckDB/Spark CBO both bin this way): the 8 bucket
    // upper bounds that split order totals into equal-count bands, by
    // rank selection over the value-count table (smallest value whose
    // cumulative count reaches k·n/8 — integer cum·8 ≥ k·n compares,
    // the percentile_cont discipline). The ×8 bucket fan is a
    // broadcast of a constant grid over the (distinct value)-count
    // table — never raw rows.
    "layout_equidepth_hist" -> ((s, d) => {
      val vc = Tables.orders(s, d)
        .select(cents(col("o_totalprice")).as("v"))
        .groupBy("v").agg(count(lit(1)).as("c"))
      // two-level bucketed cumsum (the stat_ks_segments discipline):
      // o_totalprice is near-unique, so a naive global window over the
      // value-count table would funnel ~|orders| rows through ONE
      // task at 100 TB; bucketing by v div 1000 bounds every window
      // partition (within-bucket) or shrinks it 1000x (bucket bases)
      val bk = vc.withColumn("b", expr("v div 1000L"))
      val bases = bk.groupBy("b").agg(sum("c").as("bt"))
        .withColumn("base", coalesce(sum("bt").over(
          org.apache.spark.sql.expressions.Window.orderBy("b")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)), lit(0L)))
        .select("b", "base")
      val cum = bk.join(broadcast(bases), "b")
        .withColumn("cum", col("base") + sum("c").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("b").orderBy("v")))
      val n = vc.agg(sum("c").as("n"))
      cum.crossJoin(broadcast(n))
        .select(col("v"), col("cum"), col("n"),
          explode(sequence(lit(1L), lit(8L))).as("bucket"))
        .filter(col("cum") * 8L >= col("bucket") * col("n"))
        .groupBy("bucket")
        .agg(min(struct(col("v"), col("cum"))).as("sel"),
          max("n").as("n_rows"))
        .select(col("bucket"), (col("sel.v") / 100.0).as("upper_bound"),
          col("sel.cum").as("rows_leq"), col("n_rows"))
        .orderBy("bucket")
    }),

    // Column-encoding advisor — the write-side profile that decides
    // dictionary vs plain encoding (and flags sort-friendly columns)
    // before a table lands as parquet: per audited column, row count,
    // distinct count, the hottest value's share (ppm), and the
    // dictionary verdict (distinct·[[DictMaxRatio]] ≤ rows — integer
    // compare, the parquet-writer heuristic). One scan + one
    // keys-space aggregate per column, unioned (the hottest value
    // itself stays out of the report, so no tie-break convention is
    // needed — only its count; string-encoding the key lets one
    // report cover every column type).
    "layout_encoding_stats" -> ((s, d) => {
      def prof(df: DataFrame, c: String, label: String): DataFrame = {
        val vc = df.filter(col(c).isNotNull)
          .groupBy(col(c).cast("string").as("v"))
          .agg(count(lit(1)).as("n"))
        vc.agg(sum("n").as("n_rows"), count(lit(1)).as("n_distinct"),
            max("n").as("top_count"))
          .select(lit(label).as("column_name"), col("n_rows"),
            col("n_distinct"), col("top_count"),
            expr("top_count * 1000000 div n_rows").as("top_ppm"),
            // coalesce: an empty/all-NULL column leaves n_rows NULL
            // (sum over zero rows) and the 3VL comparison NULL, while
            // the oracle CASE lands in ELSE 0 — pin 0 in both
            coalesce((col("n_distinct") * DictMaxRatio <= col("n_rows"))
              .cast("long"), lit(0L)).as("dict_recommended"))
      }
      prof(Tables.lineitem(s, d), "l_returnflag", "lineitem.l_returnflag")
        .union(prof(Tables.lineitem(s, d), "l_suppkey", "lineitem.l_suppkey"))
        .union(prof(Tables.orders(s, d), "o_orderpriority",
          "orders.o_orderpriority"))
        .union(prof(Tables.events(s, d), "event_type", "events.event_type"))
        .union(prof(Tables.events(s, d), "user_id", "events.user_id"))
        .union(prof(Tables.documents(s, d), "lang", "documents.lang"))
        .orderBy("column_name")
    }),

    // Distribution drift between the stream's two TIME HALVES per
    // event type — the retrain-trigger monitor. Distance is TOTAL
    // VARIATION over 10 equal-width value bins, computed as the exact
    // integer Σ|n1·N2 − n2·N1| over the common denominator with ONE
    // final division to ppm — no logs (PSI's ln is not guaranteed
    // identically rounded across engines), no float accumulation.
    // Plan: two fact aggregates (split point, binned counts) and
    // arithmetic on the bounded (type, bin) table.
    "dq_distribution_drift" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("xc"))
      val span = ev.agg(min("ts_s").as("t0"), max("ts_s").as("t1"),
        min("xc").as("x0"), max("xc").as("x1"))
      val binned = ev.crossJoin(broadcast(span))
        .select(col("event_type"),
          (col("ts_s") * 2 >= col("t0") + col("t1")).as("late"),
          expr("least((xc - x0) * 10 div (x1 - x0 + 1), 9)").as("bin"))
      val counts = binned.groupBy("event_type", "bin")
        .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n2"))
      val totals = counts.groupBy("event_type")
        .agg(sum("n1").as("tn1"), sum("n2").as("tn2"))
      counts.join(broadcast(totals), "event_type")
        .groupBy("event_type")
        .agg(max("tn1").as("n_early"), max("tn2").as("n_late"),
          sum(abs(col("n1") * col("tn2") - col("n2") * col("tn1")))
            .as("num"))
        .select(col("event_type"), col("n_early"), col("n_late"),
          // exact integer num (≤ 2·N1·N2) then one float scale —
          // ×10^6 BEFORE the divide would overflow BIGINT three
          // decades earlier. Integer headroom, ENFORCED (round-12
          // wave 7): the cross-products n1·tn2 wrap past ~3·10⁹ rows
          // per half — BELOW the 100 TB envelope (~10¹² per half), the
          // stat_chi_square class — so the 2·N1·N2 bound raises loudly
          // from the wrap-proof per-type totals. A type confined to
          // ONE half (introduced late / retired early) has no
          // cross-half distance: NULL in both twins, never the x/0.0
          // Inf/NaN the engines need not agree on
          Exact.momentGuard(s, "dq_distribution_drift", "2*N1*N2",
            lit(2.0) * col("n_early").cast("double") *
              col("n_late").cast("double"))(
            when(col("n_early") === 0L || col("n_late") === 0L,
              lit(null).cast("double"))
              .otherwise(col("num").cast("double") * 1000000.0 /
                (lit(2L) * col("n_early") * col("n_late")).cast("double")))
            .as("tvd_ppm"))
        .orderBy("event_type")
    }),

    "layout_zorder_stats" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("xu", col("user_id") % 65536L)
        .withColumn("xt", unix_timestamp(col("ts")) % 65536L)
      val z = (0 until 16).map { i =>
        (shiftleft(col("xu").bitwiseAND(lit(1L << i)), i) +
          shiftleft(col("xt").bitwiseAND(lit(1L << i)), i + 1))
      }.reduce(_ + _)
      ev.withColumn("zval", z)
        .withColumn("bucket", shiftright(col("zval"), 24))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_events"),
          min("xu").as("min_user"), max("xu").as("max_user"),
          min("xt").as("min_t"), max("xt").as("max_t"))
        .orderBy("bucket")
    }),

    // Incremental materialized-view maintenance: the MV is the
    // per-(event_type, day) count/value rollup; a delta batch arrives
    // (here the event_id % 10 == 0 slice plays the new arrivals) and
    // the refresh MERGES delta partials into the stored state by key
    // — count and integer-cents sum are associative, so
    // merge(base, delta) ≡ recompute(base ∪ delta) BIT-FOR-BIT, which
    // is exactly what the oracle (a full recompute) verifies. Scale
    // shape: in production the base leg is the STORED MV table
    // (group-count-sized, no fact scan); refresh cost is
    // |delta| + |touched keys| — the 100 TB history is never
    // rescanned. n_delta_rows surfaces per-group delta attribution,
    // proving the two legs really were computed separately before the
    // merge.
    "mv_incremental_refresh" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val isDelta = col("event_id") % 10 === 0
      def partial(df: DataFrame) = df.groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("v"))
      val mv = partial(ev.filter(!isDelta))
      val delta = partial(ev.filter(isDelta))
      mv.as("b").join(delta.as("dl"), Seq("event_type", "day"), "full_outer")
        .select(col("event_type"), col("day"),
          (coalesce(col("b.n"), lit(0L)) +
            coalesce(col("dl.n"), lit(0L))).as("n_events"),
          ((coalesce(col("b.v"), lit(0L)) +
            coalesce(col("dl.v"), lit(0L))) / 100.0).as("total_value"),
          coalesce(col("dl.n"), lit(0L)).as("n_delta_rows"))
        .orderBy("event_type", "day")
    }),

    // Incremental maintenance of a JOIN view — the delta-join algebra
    // (Blakeley et al., SIGMOD'86) that mv_incremental_refresh's
    // aggregate merge doesn't cover: with base tables O, C and
    // arriving deltas ΔO, ΔC, the view delta is
    // ΔO⋈C_old ∪ O_old⋈ΔC ∪ ΔO⋈ΔC — three joins whose inputs are
    // delta-sized on at least one side (in production the old legs
    // probe the STORED view/table, so refresh cost is |Δ|·fanout, and
    // the 100 TB history is never rescanned). Here orders flag
    // o_orderkey%10=0 and customers c_custkey%20=0 as the arriving
    // slices, each term's per-segment census is computed SEPARATELY,
    // and the associative merge of the four censuses must equal the
    // direct full-join census — which is exactly the oracle (a naive
    // full recompute), so the hash proves the delta algebra loses and
    // double-counts nothing, including on the ΔO⋈ΔC corner.
    // n_from_delta surfaces the delta-attributed rows per segment.
    "mv_join_delta" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        cents(col("o_totalprice")).as("pc"),
        (col("o_orderkey") % 10L === 0L).as("isd"))
      val c = Tables.customer(s, d).select(
        col("c_custkey").as("o_custkey"), col("c_mktsegment"),
        (col("c_custkey") % 20L === 0L).as("isdc"))
      def census(of: DataFrame, cf: DataFrame, fromDelta: Boolean) =
        of.join(cf, "o_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), sum("pc").as("v"))
          .withColumn("dl", lit(if (fromDelta) 1L else 0L))
      val oOld = o.filter(!col("isd")); val oD = o.filter(col("isd"))
      val cOld = c.filter(!col("isdc")); val cD = c.filter(col("isdc"))
      census(oOld, cOld, fromDelta = false)
        .unionByName(census(oD, cOld, fromDelta = true))
        .unionByName(census(oOld, cD, fromDelta = true))
        .unionByName(census(oD, cD, fromDelta = true))
        .groupBy("c_mktsegment")
        .agg(sum("n").as("n_rows"),
          (sum("v") / 100.0).as("total_value"),
          sum(when(col("dl") === 1L, col("n")).otherwise(0L))
            .as("n_from_delta"))
        .orderBy("c_mktsegment")
    }),

    // Map-side (partial) aggregation visibility: pre-aggregate per
    // input partition before the shuffle, then merge — what Catalyst
    // does automatically for sum/count, expressed explicitly over the
    // high-cardinality (user, day) key so the shuffle carries partial
    // rows, not raw events.
    "agg_two_stage_user_day" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("v"))
        .orderBy("user_id", "day")),

    // INTERVAL-OVERLAP join — the interval×interval join flavor (range
    // join = point×interval, as-of = point×nearest; this is the third):
    // per-user session intervals × globally "hot" activity hours
    // (hours with > 1.5× the mean hourly volume, an integer-exact
    // predicate). The naive plan is a quadratic theta-join on the
    // overlap predicate; the scale shape BANDS each session to the
    // hours it covers (bounded fan: span/hour rows per session) and
    // equi-joins on the hour key against the broadcast hot set —
    // overlap ⟺ sharing a covered hour, exactly, because hours tile
    // the line. The oracle spells the plain overlap predicate
    // (s.start < (h+1)·3600 ∧ s.end ≥ h·3600), so the hash proves the
    // banding equivalence.
    "join_interval_overlap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val es = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("tsec"))
      val perUser = Window.partitionBy("user_id").orderBy("tsec", "event_id")
      val lagT = lag("tsec", 1).over(perUser)
      val sess = es
        .withColumn("new_s",
          when(lagT.isNull || col("tsec") - lagT > 1800, 1L).otherwise(0L))
        .withColumn("sid", sum("new_s").over(
          perUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("tsec").as("start_s"), max("tsec").as("end_s"),
          count(lit(1)).as("n_events"))
      val hourly = es.select(expr("tsec div 3600").as("h"))
        .groupBy("h").agg(count(lit(1)).as("c"))
      val tot = hourly.agg(sum("c").as("total"), count(lit(1)).as("n_hours"))
      val hot = hourly.crossJoin(broadcast(tot))
        .filter(col("c") * col("n_hours") * 10L > col("total") * 15L)
        .select(col("h"), col("c").as("he"))
      val fan = sess.withColumn("h",
        explode(sequence(expr("start_s div 3600"), expr("end_s div 3600"))))
      val ov = fan.join(broadcast(hot), "h")
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("nh"), min("h").as("fh"), sum("he").as("hhe"))
      sess.join(ov, Seq("user_id", "sid"), "left")
        .select(col("user_id"), col("sid").as("session_id"),
          col("start_s"), col("end_s"), col("n_events"),
          coalesce(col("nh"), lit(0L)).as("n_hot_hours"),
          col("fh").as("first_hot_hour"),
          coalesce(col("hhe"), lit(0L)).as("hot_hour_events"))
        .orderBy("user_id", "session_id")
    }),

    // Histogram-quantile sketch: the HASH-CHECKED mergeable
    // approximate-quantile — the glass-box counterpart to
    // sketch_approx_quantiles (whose KLL internals stay opaque; since
    // round 12 its OUTPUT is an oracle-checked bound contract),
    // completing the sketch family's oracle story alongside the KMV
    // distinct twin. 64 equi-width integer-cents buckets
    // between the global min/max (a 1-row broadcast); the p-quantile
    // estimate is the UPPER EDGE of the first bucket whose cumulative
    // count reaches ceil(p·n) — error bounded by one bucket width
    // (surfaced as bucket_cents), counts mergeable by plain addition
    // (the mv_incremental_refresh associativity argument). All
    // arithmetic is integer until the final /100; the cum window runs
    // over ≤ 64 rows per status.
    "sketch_histogram_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val B = 64L
      val o = Tables.orders(s, d).select(col("o_orderstatus").as("status"),
        cents(col("o_totalprice")).as("tp"))
      val bounds = o.agg(min("tp").as("lo"), max("tp").as("hi"))
      val hist = o.crossJoin(broadcast(bounds))
        .select(col("status"), col("lo"), col("hi"),
          expr(s"least(${B - 1L}, ((tp - lo) * $B) div (hi - lo + 1))")
            .as("bucket"))
        .groupBy("status", "lo", "hi", "bucket")
        .agg(count(lit(1)).as("c"))
      val cum = hist
        .withColumn("cum", sum("c").over(
          Window.partitionBy("status").orderBy("bucket")))
        .withColumn("n", sum("c").over(Window.partitionBy("status")))
      def pick(p: Double, name: String) =
        (min(when(col("cum") >= ceil(col("n") * p),
          expr(s"lo + ((bucket + 1) * (hi - lo + 1)) div $B"))) / 100.0)
          .as(name)
      cum.groupBy("status")
        .agg(max("n").as("n_orders"),
          expr(s"(max(hi) - max(lo) + 1) div $B").as("bucket_cents"),
          pick(0.5, "p50_est"), pick(0.9, "p90_est"), pick(0.99, "p99_est"))
        .orderBy("status")
    }),

    // Small-file compaction planner — the table-maintenance advisor
    // every lakehouse runs nightly (Iceberg/Delta rewrite-data-files
    // semantics): given a simulated file manifest (doc_id-sharded
    // text payload per source), assign files to target-size output
    // bins by cumulative-bytes division and report, per source, the
    // before/after layout the rewrite would produce. The bin rule
    // floor(cum_bytes_before / target) is the standard streaming
    // bin-pack approximation: every output bin is ≥ the target minus
    // one file (no pathological tiny bin except the tail). Scale
    // shape: compaction planning is METADATA work — the only
    // data-touching step is the manifest aggregate (file-count-sized,
    // ~millions of rows at 100 TB); the window runs per SOURCE over
    // its files, never over rows, and the report is source-count
    // rows. The plan never reads payload bytes.
    "layout_compaction_plan" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val files = Tables.documents(s, d)
        .groupBy(col("source"),
          // integer div, not Column./ (IEEE double division): above 2^53
          // the double quotient loses integer precision and bins
          // differently than the oracle's exact //
          (expr("doc_id div 20L") % 16L).as("file_id"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
      val w = Window.partitionBy("source").orderBy("file_id")
      val binned = files.withColumn("cum_before",
          coalesce(sum("bytes").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("bin", expr(s"cum_before div $CompactTargetBytes"))
      val bins = binned.groupBy("source", "bin").agg(
        count(lit(1)).as("nf"), sum("bytes").as("bb"))
      bins.groupBy("source").agg(
        sum("nf").as("n_files"), sum("bb").as("total_bytes"),
        count(lit(1)).as("n_bins"), max("bb").as("max_bin_bytes"),
        max("nf").as("max_bin_files"))
        .select(col("source"), col("n_files"), col("total_bytes"),
          col("n_bins"), col("max_bin_bytes"), col("max_bin_files"),
          expr("total_bytes div n_bins").as("avg_bin_bytes"))
        .orderBy("source")
    })
  )

  /** Per-(event_type, bucket) HLL registers — the shared body of
    * sketch_hll_manual / sketch_hll_estimate. One map-side-combined
    * groupBy: the shuffle carries ≤ |types|·m register rows. Only
    * buckets that saw a value appear (register ≥ 1); consumers
    * zero-fill. */
  private def hllRegisters(s: SparkSession, d: String): DataFrame = {
    val h = xxhash64(col("event_id").cast("string"))
    val bucket = shiftrightunsigned(h, 64 - HllP)
    val field = shiftrightunsigned(h, 27).bitwiseAND(lit(0xFFFFFFFFL))
    val rho = when(field === 0L, lit(33L))
      .otherwise(lit(33L) - length(bin(field)).cast("long"))
    Tables.events(s, d)
      .select(col("event_type"), bucket.as("bucket"), rho.as("rho"))
      .groupBy("event_type", "bucket").agg(max("rho").as("register"))
  }

  /** Shared uint64/bucket/rho CTE chain of the two HLL oracles —
    * from `esrc(<keys>, s0)` to `rr(<keys>, bucket, rho)`. */
  private def hllRhoSql(keys: Seq[String]): String = {
    val ks = if (keys.isEmpty) "" else keys.mkString("", ", ", ",")
    s"""${graft.llm.XxhSql.ctes("esrc", keys :+ "s0", "s0", "eh")},
       |uhx AS (SELECT $ks hv + CASE WHEN hv < 0
       |    THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS uh
       |  FROM eh_out),
       |br AS (SELECT $ks
       |    CAST(uh // ${1L << 59} AS BIGINT) AS bucket,
       |    CAST((uh // ${1L << 27}) % ${1L << 32} AS BIGINT) AS field
       |  FROM uhx),
       |rr AS (SELECT $ks bucket,
       |    CASE WHEN field = 0 THEN 33 ELSE 33 - length(bin(field)) END AS rho
       |  FROM br)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // The three sketch oracles replay only the DETERMINISTIC side of
    // each contract row: the exact counts DuckDB can recompute, the
    // inlined bound constants, and TRUE for the within-bound booleans
    // the Spark twin proves (any out-of-bound estimate flips the flag
    // and hash-fails here).
    "sketch_hll_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  CAST(50000 AS BIGINT) AS rel_err_ppm_bound,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sketch_hll_merge" ->
      """WITH t AS (SELECT event_type,
        |    count(DISTINCT user_id) AS type_users
        |  FROM events GROUP BY event_type)
        |SELECT (SELECT count(*) FROM t) AS n_sketches,
        |  (SELECT count(DISTINCT user_id) FROM events) AS exact_users,
        |  CAST(COALESCE((SELECT sum(type_users) FROM t), 0) AS BIGINT)
        |    AS sum_type_users,
        |  CAST(20000 AS BIGINT) AS rel_err_ppm_bound,
        |  TRUE AS merged_within_bound""".stripMargin,

    "sketch_approx_quantiles" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(10000 AS BIGINT) AS rel_err_ppm_bound,
        |  TRUE AS p50_within, TRUE AS p90_within, TRUE AS p99_within
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sketch_cms_terms" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
         |cnt AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
         |hsrc AS (SELECT term, tf, r.range AS ri, term || '#' || r.range AS s0
         |         FROM cnt CROSS JOIN range(0, $CmsDepth) r),
         |${graft.llm.XxhSql.ctes("hsrc", Seq("term", "tf", "ri"), "s0", "ch")},
         |hb AS (SELECT term, tf, ri,
         |    ((hv % $CmsWidth) + $CmsWidth) % $CmsWidth AS bucket FROM ch_out),
         |counters AS (SELECT ri, bucket, CAST(sum(tf) AS BIGINT) AS counter
         |             FROM hb GROUP BY ri, bucket),
         |top10 AS (SELECT term, tf AS exact_n FROM cnt
         |          ORDER BY tf DESC, term LIMIT 10),
         |est AS (SELECT h.term, CAST(min(c.counter) AS BIGINT) AS approx_n
         |        FROM hb h JOIN counters c USING (ri, bucket)
         |        JOIN top10 t ON t.term = h.term GROUP BY h.term)
         |SELECT t.term, t.exact_n, e.approx_n
         |FROM top10 t JOIN est e ON e.term = t.term
         |ORDER BY t.exact_n DESC, t.term""".stripMargin,

    "sketch_hll_manual" ->
      s"""WITH esrc AS (
         |  SELECT DISTINCT event_type, CAST(event_id AS VARCHAR) AS s0 FROM events),
         |${hllRhoSql(Seq("event_type"))},
         |regs AS (SELECT event_type, bucket, CAST(max(rho) AS BIGINT) AS register
         |         FROM rr GROUP BY event_type, bucket),
         |grid AS (SELECT DISTINCT e.event_type, r.range AS bucket
         |         FROM events e CROSS JOIN range(0, $HllM) r)
         |SELECT g.event_type, g.bucket, COALESCE(rg.register, 0) AS register
         |FROM grid g LEFT JOIN regs rg
         |  ON rg.event_type = g.event_type AND rg.bucket = g.bucket
         |ORDER BY g.event_type, g.bucket""".stripMargin,

    "sketch_hll_estimate" ->
      s"""WITH esrc AS (
         |  SELECT DISTINCT CAST(event_id AS VARCHAR) AS s0 FROM events),
         |${hllRhoSql(Seq.empty)},
         |regs AS (SELECT bucket, CAST(max(rho) AS BIGINT) AS register
         |         FROM rr GROUP BY bucket),
         |s AS (SELECT
         |    CAST(sum(1::BIGINT << CAST(33 - register AS INT)) +
         |      ($HllM - count(*)) * ${1L << 33} AS BIGINT) AS s_exact,
         |    count(*) AS nonzero_registers
         |  FROM regs),
         |exact AS (SELECT count(DISTINCT event_id) AS exact_ids FROM events)
         |SELECT e.exact_ids, s.nonzero_registers, s.s_exact,
         |  (${HllAlpha * HllM * HllM}::DOUBLE * ${(1L << 33).toDouble}) /
         |    CAST(s.s_exact AS DOUBLE) AS est_ids
         |FROM s, exact e""".stripMargin,

    "agg_salted_hot_key" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  ${moneySumSql("value")} AS total_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sketch_bloom_prejoin" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${moneySumSql("o_totalprice")} AS total_value
         |FROM orders WHERE o_custkey IN
         |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "sketch_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "join_range_bins" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  CAST(floor(epoch(p.ts)) AS BIGINT) AS p_sec,
        |  count(c.user_id) AS n_prior_clicks
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    "join_salted_skew" ->
      s"""WITH dim AS (SELECT DISTINCT event_type,
         |    CAST(length(event_type) AS BIGINT) AS w FROM events)
         |SELECT e.event_type, count(*) AS n_events,
         |  sum(${centsSql("e.value")} * d.w)/100.0 AS weighted_value
         |FROM events e JOIN dim d USING (event_type)
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "layout_equidepth_hist" ->
      s"""WITH vc AS (
         |  SELECT ${centsSql("o_totalprice")} AS v,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM orders GROUP BY 1),
         |cum AS (
         |  SELECT v, c,
         |    CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
         |  FROM vc),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vc),
         |g AS (SELECT unnest(range(1, 9)) AS bucket),
         |sel AS (
         |  SELECT g.bucket, min(cum.v) AS ub_c
         |  FROM cum CROSS JOIN nn CROSS JOIN g
         |  WHERE cum.cum * 8 >= g.bucket * nn.n
         |  GROUP BY g.bucket)
         |SELECT CAST(s.bucket AS BIGINT) AS bucket,
         |  s.ub_c / 100.0 AS upper_bound,
         |  (SELECT cum FROM cum WHERE cum.v = s.ub_c) AS rows_leq,
         |  nn.n AS n_rows
         |FROM sel s, nn ORDER BY bucket""".stripMargin,

    "layout_encoding_stats" -> {
      def prof(table: String, c: String, label: String): String =
        s"""SELECT '$label' AS column_name,
           |  CAST(sum(n) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_distinct,
           |  CAST(max(n) AS BIGINT) AS top_count,
           |  CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS top_ppm,
           |  CAST(CASE WHEN count(*) * $DictMaxRatio <= sum(n)
           |       THEN 1 ELSE 0 END AS BIGINT) AS dict_recommended
           |FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS n
           |      FROM $table WHERE $c IS NOT NULL GROUP BY 1)""".stripMargin
      Seq(prof("lineitem", "l_returnflag", "lineitem.l_returnflag"),
        prof("lineitem", "l_suppkey", "lineitem.l_suppkey"),
        prof("orders", "o_orderpriority", "orders.o_orderpriority"),
        prof("events", "event_type", "events.event_type"),
        prof("events", "user_id", "events.user_id"),
        prof("documents", "lang", "documents.lang"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    "layout_partition_stats" ->
      """WITH bs AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |          CAST(count(*) AS BIGINT) AS n_sources FROM bs)
        |SELECT source, n_docs, bytes,
        |  CAST(ceil(CAST(bytes AS DOUBLE) / 134217728.0) AS BIGINT)
        |    AS target_files,
        |  bytes * n_sources * 1000000 // nullif(total_bytes, 0) AS vs_mean_ppm
        |FROM bs, tot ORDER BY source""".stripMargin,

    "dq_distribution_drift" ->
      s"""WITH ev AS (
         |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         |    ${Exact.centsSql("\"value\"")} AS xc
         |  FROM events),
         |span AS (SELECT min(ts_s) AS t0, max(ts_s) AS t1,
         |           min(xc) AS x0, max(xc) AS x1 FROM ev),
         |binned AS (
         |  SELECT event_type, ts_s * 2 >= t0 + t1 AS late,
         |    least((xc - x0) * 10 // (x1 - x0 + 1), 9) AS bin
         |  FROM ev, span),
         |counts AS (
         |  SELECT event_type, bin,
         |    CAST(sum(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM binned GROUP BY 1, 2),
         |totals AS (
         |  SELECT event_type, CAST(sum(n1) AS BIGINT) AS tn1,
         |    CAST(sum(n2) AS BIGINT) AS tn2
         |  FROM counts GROUP BY event_type)
         |SELECT c.event_type, max(tn1) AS n_early, max(tn2) AS n_late,
         |  CASE WHEN max(tn1) = 0 OR max(tn2) = 0 THEN NULL
         |  ELSE CAST(sum(abs(n1 * tn2 - n2 * tn1)) AS DOUBLE) * 1000000.0 /
         |    CAST(2 * max(tn1) * max(tn2) AS DOUBLE) END AS tvd_ppm
         |FROM counts c JOIN totals t ON c.event_type = t.event_type
         |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin,

    "layout_zorder_stats" -> {
      val zTerms = (0 until 16).flatMap(i => Seq(
        s"((xu & ${1L << i}) << $i)",
        s"((xt & ${1L << i}) << ${i + 1})")).mkString(" + ")
      s"""WITH t AS (
         |  SELECT user_id % 65536 AS xu,
         |    CAST(floor(epoch(ts)) AS BIGINT) % 65536 AS xt
         |  FROM events),
         |z AS (SELECT xu, xt, ($zTerms) >> 24 AS bucket FROM t)
         |SELECT bucket, count(*) AS n_events,
         |  min(xu) AS min_user, max(xu) AS max_user,
         |  min(xt) AS min_t, max(xt) AS max_t
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    // The oracle is the FULL recompute over base ∪ delta — the hash
    // match is the incremental-refresh correctness proof.
    "mv_incremental_refresh" ->
      s"""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         |  count(*) AS n_events,
         |  ${moneySumSql("value")} AS total_value,
         |  CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_delta_rows
         |FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
         |ORDER BY event_type, day""".stripMargin,

    // Deliberately the naive full recompute — agreement proves the
    // engine's four-way delta-join merge exact.
    "mv_join_delta" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
         |  ${moneySumSql("o_totalprice")} AS total_value,
         |  CAST(sum(CASE WHEN o_orderkey % 10 = 0 OR c_custkey % 20 = 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_from_delta
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_two_stage_user_day" ->
      s"""SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
         |  ${moneySumSql("value")} AS v
         |FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
         |ORDER BY user_id, day""".stripMargin,

    "join_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |x AS (SELECT *, CASE WHEN tsec - lag(tsec) OVER
        |      (PARTITION BY user_id ORDER BY tsec, event_id) > 1800
        |      OR lag(tsec) OVER
        |      (PARTITION BY user_id ORDER BY tsec, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |sx AS (SELECT *, sum(new_s) OVER
        |    (PARTITION BY user_id ORDER BY tsec, event_id
        |     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |sess AS (SELECT user_id, sid, min(tsec) AS start_s,
        |    max(tsec) AS end_s, count(*) AS n_events
        |  FROM sx GROUP BY 1, 2),
        |hourly AS (SELECT tsec // 3600 AS h, count(*) AS c
        |  FROM e GROUP BY 1),
        |tot AS (SELECT sum(c) AS total, count(*) AS n_hours FROM hourly),
        |hot AS (SELECT h, c AS he FROM hourly, tot
        |  WHERE c * n_hours * 10 > total * 15),
        |ov AS (SELECT user_id, sid, count(*) AS nh, min(h) AS fh,
        |    sum(he) AS hhe
        |  FROM sess JOIN hot
        |    ON sess.start_s < (h + 1) * 3600 AND sess.end_s >= h * 3600
        |  GROUP BY 1, 2)
        |SELECT sess.user_id AS user_id,
        |  CAST(sess.sid AS BIGINT) AS session_id,
        |  start_s, end_s, n_events,
        |  coalesce(nh, 0) AS n_hot_hours, fh AS first_hot_hour,
        |  CAST(coalesce(hhe, 0) AS BIGINT) AS hot_hour_events
        |FROM sess LEFT JOIN ov
        |  ON sess.user_id = ov.user_id AND sess.sid = ov.sid
        |ORDER BY user_id, session_id""".stripMargin,

    "sketch_histogram_quantiles" ->
      s"""WITH o AS (SELECT o_orderstatus AS status,
         |    ${centsSql("o_totalprice")} AS tp FROM orders),
         |b AS (SELECT min(tp) AS lo, max(tp) AS hi FROM o),
         |h AS (SELECT status, lo, hi,
         |    least(63, ((tp - lo) * 64) // (hi - lo + 1)) AS bucket,
         |    count(*) AS c
         |  FROM o, b GROUP BY 1, 2, 3, 4),
         |cum AS (SELECT *,
         |    sum(c) OVER (PARTITION BY status ORDER BY bucket) AS cm,
         |    sum(c) OVER (PARTITION BY status) AS n
         |  FROM h)
         |SELECT status, CAST(max(n) AS BIGINT) AS n_orders,
         |  (max(hi) - max(lo) + 1) // 64 AS bucket_cents,
         |  min(CASE WHEN cm >= ceil(n * 0.5)
         |    THEN lo + ((bucket + 1) * (hi - lo + 1)) // 64 END)/100.0
         |    AS p50_est,
         |  min(CASE WHEN cm >= ceil(n * 0.9)
         |    THEN lo + ((bucket + 1) * (hi - lo + 1)) // 64 END)/100.0
         |    AS p90_est,
         |  min(CASE WHEN cm >= ceil(n * 0.99)
         |    THEN lo + ((bucket + 1) * (hi - lo + 1)) // 64 END)/100.0
         |    AS p99_est
         |FROM cum GROUP BY status ORDER BY status""".stripMargin,

    "layout_compaction_plan" ->
      s"""WITH files AS (
         |  SELECT source, (doc_id // 20) % 16 AS file_id,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS bytes
         |  FROM documents GROUP BY source, (doc_id // 20) % 16),
         |binned AS (
         |  SELECT source, bytes,
         |    CAST(coalesce(sum(bytes) OVER (PARTITION BY source
         |      ORDER BY file_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) // $CompactTargetBytes AS bin
         |  FROM files),
         |bins AS (
         |  SELECT source, bin, CAST(count(*) AS BIGINT) AS nf,
         |    CAST(sum(bytes) AS BIGINT) AS bb
         |  FROM binned GROUP BY source, bin)
         |SELECT source, CAST(sum(nf) AS BIGINT) AS n_files,
         |  CAST(sum(bb) AS BIGINT) AS total_bytes,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  max(bb) AS max_bin_bytes, max(nf) AS max_bin_files,
         |  CAST(sum(bb) AS BIGINT) // count(*) AS avg_bin_bytes
         |FROM bins GROUP BY source ORDER BY source""".stripMargin)
}
