package graft.llm

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling primitives for training-data assembly —
  * the operations a 100 TB curation pipeline runs after dedup/quality
  * gating to actually CUT the corpus: stratified downsampling to
  * per-class targets, negative sampling for contrastive objectives,
  * and an order-invariant dataset fingerprint for run-to-run drift
  * detection. Everything is hash-threshold arithmetic on
  * `xxhash64` — no `rand()` — so results are reproducible across
  * runs, partitionings and engines, and the DuckDB oracle replays
  * every decision bit-for-bit via [[XxhSql]].
  *
  * Scale design: the samplers never shuffle the fact table. The
  * stratified sampler aggregates per-stratum counts (a |strata|-row
  * table), broadcasts the thresholds back, and filters map-side; the
  * negative sampler generates candidates map-side from a bounded
  * anchor set (TakeOrderedAndProject, per-partition heads — not a
  * global sort) and anti-joins the full positive set on the composite
  * key; the fingerprint is one map-side pass per table folding into
  * four 1-row aggregates (XOR is commutative — no ordering, no sort,
  * no single-partition funnel anywhere).
  */
object SampleQueries extends QuerySuite {

  /** Per-stratum row target for the stratified sampler. */
  val Target = 100L

  /** Hash-threshold resolution: keep iff bucket < thr out of 10^6. */
  val Res = 1000000L

  /** Negatives drawn per anchor positive (no resampling on
    * collision — the emit→anti-join contract keeps the pass
    * driver-loop-free; collisions only THIN the output, by an
    * expected |positives|/|parts| fraction, and the spec bounds the
    * observed loss). */
  val K = 2

  /** Anchor-set bound for the negative-sampling demo. */
  val Anchors = 2000

  /** PPS systematic-sampling tick count: one selection tick every
    * total_weight div PpsK weight units. */
  val PpsK = 50L

  /** Bucket width (doc_id units) for the PPS two-level prefix sum,
    * DERIVED from the corpus so the decomposition self-balances at
    * any scale: ⌈√N⌉ buckets of width ⌈(max_id+1)/⌈√N⌉⌉ put BOTH
    * axes — the per-bucket local window and the single-partition
    * bucket-base window — at ~√N rows (10⁶ each at 10¹² docs),
    * instead of a fixed width that leaves one axis data-sized. The
    * result is width-invariant (the two-level sum telescopes to the
    * same global prefix for ANY width ≥ 1 — PpsSpec pins that), so
    * deriving it is purely a plan-shape decision; a third prefix
    * level would take the axes to ∛N if ever needed. */
  def ppsBucketWidth(nDocs: Long, maxId: Long): Long = {
    val buckets = math.max(1L, math.ceil(math.sqrt(nDocs.toDouble)).toLong)
    // = ceil((maxId+1)/buckets), spelled overflow-free: the naive
    // (maxId + buckets) / buckets wraps when maxId is within `buckets`
    // of Long.MaxValue (hashed ids live there) and would silently
    // collapse the width to 1 — the data-sized bucket table the
    // derivation exists to prevent. floor(m/b)+1 is the same value
    // for every m ≥ 0 and never overflows.
    math.max(1L, maxId / buckets + 1L)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Probability-proportional-to-size SYSTEMATIC sampling (the
    // Madow'49 scheme, zero-offset variant): lay every doc's weight
    // (n_chars) end to end in doc_id order and select each doc whose
    // weight span crosses a multiple of step = total div [[PpsK]] —
    // inclusion is exactly proportional to size, the pass is ONE
    // deterministic scan, and re-running (or re-partitioning) yields
    // the same sample, the auditable-build property the whole sampler
    // family guarantees. Pure integers: crossing ⟺
    // (cum_before + w) div step > cum_before div step. Scale shape:
    // the global cumsum NEVER materializes as one ordered partition —
    // the text_pack_sequences two-level decomposition (per-bucket
    // local cumsum + broadcast bucket base offsets) builds cum_before
    // with all windows keyed on the bounded bucket axis; the oracle's
    // single global window is the semantic twin, not the plan. Docs
    // wider than one step are selected once (selection, not
    // multiplicity — documented; ticks inside one doc don't repeat
    // it).
    "sample_pps_systematic" -> ((s, d) => {
      // one bounded 1-row pre-pass (count + max id) sizes the bucket
      // axis at ~√N — the operator-constant discipline, computed from
      // the data instead of hard-coded (see [[ppsBucketWidth]]). The
      // pre-pass runs ON the persisted projection so its action also
      // populates the cache — documents is read from storage ONCE,
      // not once for sizing and again for the sample.
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .persist()
      val dim = base.agg(count(lit(1)).as("n"), max("doc_id").as("mx"))
        .head()
      val width =
        if (dim.isNullAt(1)) 1L
        else ppsBucketWidth(dim.getLong(0), dim.getLong(1))
      val docs = base
        .withColumn("bk", expr(s"doc_id div $width"))
      val local = docs.withColumn("local_off",
        coalesce(sum("n_chars").over(Window.partitionBy("bk")
          .orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val bases = docs.groupBy("bk").agg(sum("n_chars").as("tot"))
        .withColumn("base", coalesce(sum("tot").over(Window.orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bk", "base")
      val total = docs.agg(sum("n_chars").as("tw"))
      local.join(broadcast(bases), "bk")
        .withColumn("cum0", col("base") + col("local_off"))
        .crossJoin(broadcast(total))
        // nullif-fold the degenerate corpus (tw < PpsK → step 0) so
        // the division NEVER executes against 0 regardless of
        // conjunct evaluation order: div by NULL is NULL and the
        // filter drops it — same rows as the `step > 0` spelling.
        .withColumn("step", expr(s"nullif(tw div $PpsK, 0)"))
        .filter(col("step").isNotNull &&
          expr("(cum0 + n_chars) div step > cum0 div step"))
        .select(col("doc_id"), col("n_chars"), col("cum0"),
          expr("(cum0 + n_chars) div step").as("tick"))
        .orderBy("doc_id")
    }),
    // Stratified downsampling to ≤ ~Target rows per event_type:
    // thr = Target·Res div n for oversized strata (whole stratum kept
    // otherwise), keep iff pmod(xxhash64(event_id), Res) < thr. Two
    // passes over events, both map-side: one partial-agg count and
    // one broadcast-join filter. The kept set is a deterministic
    // function of the ids — adding executors, reordering files or
    // re-running yields the SAME sample, which is what makes
    // training-set builds auditable.
    "sample_stratified_hash" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val thr = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        .select(col("event_type"),
          when(col("n") <= Target, lit(Res))
            .otherwise(expr(s"(${Target * Res}) div n")).as("thr"))
      ev.select(col("event_type"), col("event_id"))
        .join(broadcast(thr), "event_type")
        .filter(pmod(xxhash64(col("event_id").cast("string")), lit(Res))
          < col("thr"))
        .select("event_type", "event_id")
        .orderBy("event_type", "event_id")
    }),

    // Contrastive negative sampling: for each anchor (customer, part)
    // positive, K hash-derived candidate parts, minus accidental
    // positives. Candidates are pure map-side arithmetic
    // (pmod(xxhash64(user#item#j), |parts|) is a valid part id — the
    // fixture's partkeys are dense from 0); the only shuffle is the
    // left-anti join against the FULL positive set on the composite
    // key, which is exactly the join a recommender/contrastive
    // pipeline must do anyway to guarantee label correctness.
    "sample_negatives" -> ((s, d) => {
      val positives = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey").as("user"))
        .join(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("item")),
          col("o_orderkey") === col("l_orderkey"))
        .select("user", "item").distinct()
      val nParts = Tables.part(s, d).agg(count(lit(1)).as("n_parts"))
      val anchors = positives.orderBy("user", "item").limit(Anchors)
      val cands = anchors
        .crossJoin(broadcast(nParts))
        .select(col("user"), col("item"),
          explode(array((0 until K).map(j => lit(j.toLong)): _*)).as("j"),
          col("n_parts"))
        .select(col("user"), col("item"), col("j"),
          pmod(xxhash64(concat_ws("#", col("user").cast("string"),
            col("item").cast("string"), col("j").cast("string"))),
            col("n_parts")).as("neg_item"))
      cands.join(positives
          .select(col("user"), col("item").as("neg_item")),
          Seq("user", "neg_item"), "left_anti")
        .select("user", "item", "j", "neg_item")
        .orderBy("user", "item", "j")
    }),

    // Order-invariant dataset fingerprint of orders + lineitem: one
    // map-side pass per table, rows canonicalized to a '|'-joined
    // string of their stable columns, folded into (count, XOR of
    // xxhash64, min, max). XOR commutes, so the checksum is
    // partition- and order-independent with zero shuffle; two
    // pipeline runs over "the same" inputs either agree on all four
    // numbers or the drilldown starts (the data-versioning primitive
    // behind snapshot diffing at 100 TB — compare fingerprints first,
    // row-diff only when they disagree).
    "data_fingerprint" -> ((s, d) => {
      def fp(name: String, df: DataFrame, rowStr: org.apache.spark.sql.Column) =
        df.select(xxhash64(rowStr).as("h"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor_hash"),
            min("h").as("min_hash"), max("h").as("max_hash"))
          .select(lit(name).as("tbl"), col("n_rows"), col("xor_hash"),
            col("min_hash"), col("max_hash"))
      val o = fp("orders", Tables.orders(s, d),
        concat_ws("|", col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd")))
      val l = fp("lineitem", Tables.lineitem(s, d),
        concat_ws("|", col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"), col("l_partkey").cast("string"),
          col("l_suppkey").cast("string"), col("l_returnflag"),
          col("l_linestatus")))
      o.union(l).orderBy("tbl")
    }),

    // GROUP-aware train/val/test split — the leakage guard a
    // training-set build needs when rows of one entity correlate
    // (a user's events, a domain's pages): the split key is the
    // GROUP (user_id), not the row, so every row of a user lands in
    // exactly ONE split by construction and near-duplicate rows
    // within a user can never straddle train/test (the
    // contamination-by-split failure mode text_dataset_split's
    // row-level split cannot rule out). Deterministic 80/10/10 by
    // hash bucket (the suite's no-rand contract); output is the
    // split census + event-share ppm. Scale shape: one map-side
    // hash + one aggregate carrying (split, user) partials; no join,
    // no window.
    "sample_group_split" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"))
        .withColumn("b", pmod(xxhash64(
          concat(lit("grp:"), col("user_id").cast("string"))), lit(10L)))
        .withColumn("split",
          when(col("b") < 8L, "train")
            .when(col("b") === 8L, "val").otherwise("test"))
      val tot = ev.agg(count(lit(1)).as("t_events"))
      ev.groupBy("split")
        .agg(countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"))
        .crossJoin(broadcast(tot))
        .select(col("split"), col("n_users"), col("n_events"),
          expr("n_events * 1000000 div t_events").as("event_share_ppm"))
        .orderBy("split")
    }),

    // Class-balanced corpus downsampling by language — the mixture
    // equalizer a multilingual pretraining run applies before the
    // over-represented language swamps the rest. Rate-based, NOT
    // rank-based: each language keeps docs whose
    // pmod(xxhash64(doc_id), 10⁶) falls under rate_ppm =
    // min_lang_count·10⁶ / n_lang — a pure map-side predicate, so
    // the plan is two map-side-combined aggregates plus a broadcast
    // of the lang-count rate table; no per-class global rank window
    // (exact-count balancing would need one, which skew-explodes at
    // 100 TB — rate-based lands within binomial noise of balanced
    // and is the production form). kept_id_sum is an exact audit
    // checksum of the selected set. Hash replayed in the oracle via
    // XxhSql, so the driver verifies the SELECTION, not just counts.
    "sample_balanced_lang" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("lang"), col("doc_id"))
      val lc = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      val mn = lc.agg(min("n_before").as("mn"))
      val rates = lc.crossJoin(broadcast(mn))
        .select(col("lang"), col("n_before"),
          expr("mn * 1000000 div n_before").as("rate_ppm"))
      val kept = docs
        .withColumn("bucket",
          pmod(xxhash64(col("doc_id").cast("string")), lit(1000000L)))
        .join(broadcast(rates.select("lang", "rate_ppm")), "lang")
        .filter(col("bucket") < col("rate_ppm"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"),
          sum("doc_id").as("kept_id_sum"))
      rates.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_before"), col("rate_ppm"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
        .orderBy("lang")
    }))

  def oracles: Map[String, String] = Map(
    // Deliberately ONE global window — the semantic twin of the
    // engine's two-level bucketed decomposition. The step divisor is
    // NULLIF-folded exactly like the Spark side: on a degenerate
    // corpus (tw < PpsK → step 0) SQL does not guarantee conjunct
    // short-circuit, so the bare `tw // PpsK > 0 AND x // (tw //
    // PpsK) …` spelling could still evaluate the division by zero;
    // dividing by NULLIF(step, 0) yields NULL, the comparison is
    // not-true, and the row drops — same rows, no division-by-zero
    // path at any corpus.
    "sample_pps_systematic" ->
      s"""WITH c AS (
         |  SELECT doc_id, n_chars,
         |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum0
         |  FROM documents),
         |t AS (SELECT NULLIF(CAST(sum(n_chars) AS BIGINT) // $PpsK, 0)
         |        AS step
         |      FROM documents)
         |SELECT doc_id, n_chars, cum0,
         |  (cum0 + n_chars) // step AS tick
         |FROM c CROSS JOIN t
         |WHERE (cum0 + n_chars) // step > cum0 // step
         |ORDER BY doc_id""".stripMargin,
    "sample_group_split" ->
      s"""WITH gsrc AS (
         |  SELECT user_id, event_id,
         |    'grp:' || CAST(user_id AS VARCHAR) AS s0
         |  FROM events),
         |${XxhSql.ctes("gsrc", Seq("user_id", "event_id"), "s0", "gs")},
         |b AS (
         |  SELECT user_id,
         |    CASE WHEN ((hv % 10) + 10) % 10 < 8 THEN 'train'
         |         WHEN ((hv % 10) + 10) % 10 = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM gs_out),
         |tot AS (SELECT count(*) AS t FROM events)
         |SELECT split, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(*) * 1000000 // t AS BIGINT) AS event_share_ppm
         |FROM b, tot GROUP BY split, t ORDER BY split""".stripMargin,
    "sample_stratified_hash" ->
      s"""WITH esrc AS (
         |  SELECT event_type, event_id, CAST(event_id AS VARCHAR) AS s0
         |  FROM events),
         |${XxhSql.ctes("esrc", Seq("event_type", "event_id"), "s0", "sh")},
         |thr AS (SELECT event_type,
         |    CASE WHEN count(*) <= $Target THEN $Res
         |         ELSE (${Target * Res}) // count(*) END AS thr
         |  FROM events GROUP BY event_type)
         |SELECT h.event_type, h.event_id
         |FROM sh_out h JOIN thr t ON t.event_type = h.event_type
         |WHERE ((hv % $Res) + $Res) % $Res < t.thr
         |ORDER BY h.event_type, h.event_id""".stripMargin,

    "sample_negatives" ->
      s"""WITH positives AS (
         |  SELECT DISTINCT o.o_custkey AS "user", l.l_partkey AS item
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |np AS (SELECT count(*) AS n_parts FROM part),
         |anchors AS (SELECT "user", item FROM positives
         |            ORDER BY "user", item LIMIT $Anchors),
         |csrc AS (
         |  SELECT "user", item, r.range AS j,
         |    "user" || '#' || item || '#' || r.range AS s0
         |  FROM anchors CROSS JOIN range(0, $K) r),
         |${XxhSql.ctes("csrc", Seq("\"user\"", "item", "j"), "s0", "nh")},
         |cands AS (
         |  SELECT "user", item, j,
         |    ((hv % n_parts) + n_parts) % n_parts AS neg_item
         |  FROM nh_out, np)
         |SELECT c."user", c.item, c.j, c.neg_item
         |FROM cands c
         |WHERE NOT EXISTS (SELECT 1 FROM positives p
         |                  WHERE p."user" = c."user" AND p.item = c.neg_item)
         |ORDER BY c."user", c.item, c.j""".stripMargin,

    "data_fingerprint" ->
      s"""WITH osrc AS (
         |  -- concat_ws, not ||: Spark's concat_ws SKIPS a NULL field
         |  -- while || would NULL the whole canonical string — on a
         |  -- row with any NULL column the two engines would hash
         |  -- different inputs (n_rows would still match, masking it)
         |  SELECT o_orderkey AS k,
         |    concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
         |      strftime(o_orderdate, '%Y-%m-%d')) AS s0
         |  FROM orders),
         |${XxhSql.ctes("osrc", Seq("k"), "s0", "oh")},
         |lsrc AS (
         |  SELECT l_orderkey AS k,
         |    concat_ws('|', l_orderkey, l_linenumber, l_partkey,
         |      l_suppkey, l_returnflag, l_linestatus) AS s0
         |  FROM lineitem),
         |${XxhSql.ctes("lsrc", Seq("k"), "s0", "lh")},
         |fp AS (
         |  SELECT 'orders' AS tbl, count(*) AS n_rows,
         |    bit_xor(hv) AS xor_hash, min(hv) AS min_hash,
         |    max(hv) AS max_hash
         |  FROM oh_out
         |  UNION ALL
         |  SELECT 'lineitem' AS tbl, count(*) AS n_rows,
         |    bit_xor(hv) AS xor_hash, min(hv) AS min_hash,
         |    max(hv) AS max_hash
         |  FROM lh_out)
         |SELECT tbl, n_rows, xor_hash, min_hash, max_hash
         |FROM fp ORDER BY tbl""".stripMargin,

    "sample_balanced_lang" ->
      s"""WITH hsrc AS (SELECT lang, doc_id,
         |    CAST(doc_id AS VARCHAR) AS s0 FROM documents),
         |${graft.llm.XxhSql.ctes("hsrc", Seq("lang", "doc_id"), "s0", "bh")},
         |keyed AS (SELECT lang, doc_id,
         |    ((hv % 1000000) + 1000000) % 1000000 AS bucket
         |  FROM bh_out),
         |lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_before
         |  FROM documents GROUP BY lang),
         |mn AS (SELECT min(n_before) AS mn FROM lc),
         |rates AS (SELECT lang, n_before,
         |    CAST(mn * 1000000 // n_before AS BIGINT) AS rate_ppm
         |  FROM lc, mn),
         |kept AS (SELECT k.lang, CAST(count(*) AS BIGINT) AS n_kept,
         |    CAST(sum(k.doc_id) AS BIGINT) AS kept_id_sum
         |  FROM keyed k JOIN rates r USING (lang)
         |  WHERE k.bucket < r.rate_ppm GROUP BY k.lang)
         |SELECT r.lang, r.n_before, r.rate_ppm,
         |  CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(coalesce(kept.kept_id_sum, 0) AS BIGINT) AS kept_id_sum
         |FROM rates r LEFT JOIN kept USING (lang)
         |ORDER BY r.lang""".stripMargin)
}
