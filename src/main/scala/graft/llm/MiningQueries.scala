package graft.llm

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mining curation ops: PII scrubbing and vocabulary-growth
  * telemetry — both deterministic string/integer work, fully
  * hash-checked against DuckDB.
  */
object MiningQueries extends QuerySuite {

  /** Email-ish and long-digit-run patterns — identical semantics in
    * Java regex (Spark) and RE2 (DuckDB) for these constructs. */
  val EmailRe = "[a-z0-9.]+@[a-z0-9.]+"
  val IdRe = "[0-9]{6,}"

  /** Checkpoint count for the vocabulary growth curve — FIXED, so the
    * cumulative window at the end runs over ≤ ~Checkpoints rows at
    * ANY corpus size (bounded by construction, unlike a fixed bucket
    * WIDTH whose bucket count would grow with the corpus and turn the
    * cumulative into a single-task scan at 100 TB). */
  val Checkpoints = 100L

  /** Winnowing parameters (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    * word [[WinK]]-grams, window of [[WinW]] consecutive k-gram
    * hashes. The guarantee: at least one fingerprint per window, so
    * any shared run of WinK+WinW−1 words between two documents shares
    * a fingerprint; expected density ≈ 2/(WinW+1). */
  val WinK = 4
  val WinW = 5

  /** ppm scale for the bigram LM conditional probabilities — integer
    * fixed-point so every per-doc sum is exact. */
  val LmScale = 1000000L

  /** Broadcast ceiling for the contamination eval fingerprint set —
    * the GraphQueries.BroadcastNodeBudget pattern. The eval side here
    * is a FRACTION of the corpus (doc_id % 50), so it grows with data
    * volume and an unconditional broadcast breaks at 100×; real
    * benchmark suites are constant-sized, but the guard makes the
    * plan safe either way. 10^7 rows × ~24 B ≈ 240 MB — inside
    * executor memory and Spark's broadcast limit with margin; above
    * it the same join runs as a plain keyed shuffle join on `mh`.
    * The budget is checked against the eval K-GRAM count (an upper
    * bound on eval fingerprints, since winnowing selects ≤ 1
    * fingerprint per k-gram position) — one cheap aggregate over the
    * documents projection, no winnowing compute. */
  val BroadcastFpBudget = 10000000L

  /** Fingerprint fan cap for the source-overlap pair join: an fp
    * present in more sources than this is boilerplate, carries no
    * pairwise-leakage signal, and would emit C(n,2) pairs — dropped
    * from pair generation (the MaxFanout / prefix-filter cap
    * pattern). */
  val MaxFpSources = 64L

  /** Shared per-doc bigram-LM aggregate: (doc_id, n_bigrams, sum_ppm)
    * where each bigram scores its corpus conditional probability in
    * [[LmScale]] fixed point. Model and scoring are key-partitioned
    * joins over token-sized rows; document text never shuffles. Docs
    * shorter than 2 words have no bigrams and drop out. Consumed by
    * text_bigram_lm_score and text_ccnet_buckets. */
  private def lmDocScores(s: SparkSession, d: String): DataFrame = {
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 2 THEN
          |  transform(sequence(1, size(ws)-1),
          |    i -> struct(ws[i-1] AS w1, ws[i] AS w2))
          |ELSE array() END""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    bg.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .withColumn("ppm", expr(s"cb * $LmScale div cu"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("ppm").as("sum_ppm"))
  }

  /** SQL twin of [[lmDocScores]], ending in a
    * `lm(doc_id, n_bigrams, sum_ppm)` CTE. */
  private def lmDocScoresSqlCtes: String =
    s"""WITH ws AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id,
       |    unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
       |  FROM ws WHERE len(w) >= 2),
       |cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
       |cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY w1),
       |sc AS (
       |  SELECT bg.doc_id, (cb.cb * $LmScale) // cu.cu AS ppm
       |  FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1)),
       |lm AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(ppm) AS BIGINT) AS sum_ppm
       |  FROM sc GROUP BY doc_id)""".stripMargin

  /** Shared winnowing-fingerprint pipeline: (fps, nk) where fps =
    * (doc_id, fp_p, mh) — the selected fingerprint set — and nk =
    * per-doc k-gram counts. One explode to k-gram hashes, a W-way
    * bounded fan to covering window starts, then a single struct-min
    * aggregate per (doc, window): the smallest hash with rightmost
    * tie (robust winnowing), one shuffle over the fan. Used by
    * text_winnowing and text_contamination_overlap. */
  private def winnowed(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ws0 = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
    // r15 spread the (doc_id, ws) frame ABOVE this split, where it fed
    // both the kg and nk branches: the round-robin exchange of the raw
    // corpus was duplicated into every consumer subtree (12 → 18
    // Exchange nodes in text_winnowing's plan) and the driver measured
    // the query 47% SLOWER (VERDICT r15 item 2). Spread exactly ONE
    // branch instead — the k-gram hash/fan pipeline, where the per-row
    // work dwarfs the exchange — so the plan carries a single spread
    // exchange; nk is a cheap projection and reads the scan directly.
    val docs = graft.Spread.fanoutScan(ws0)
    val kg = docs
      .select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(ws) >= $WinK THEN
           |  transform(sequence(0, size(ws)-$WinK),
           |    p -> concat_ws(' ', slice(ws, p+1, $WinK)))
           |ELSE array() END""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("p"),
        xxhash64(col("col")).as("h"))
    val nk = ws0.select(col("doc_id"),
      greatest(lit(0), size(col("ws")) - WinK + 1).cast("long").as("nk"))
    val fan = kg.select(col("doc_id"), col("p"), col("h"),
      explode(sequence(greatest(lit(0L), col("p") - (WinW - 1)),
        col("p"))).as("j"))
      .join(nk, "doc_id").filter(col("j") <= col("nk") - WinW)
    val mn = fan.groupBy("doc_id", "j")
      .agg(min(struct(col("h"), (-col("p")).as("np"))).as("sel"))
    val fps = mn.select(col("doc_id"), (-col("sel.np")).as("fp_p"),
      col("sel.h").as("mh")).distinct()
    (fps, nk)
  }

  /** DSIR hashed-feature space (Xie et al. NeurIPS'23, "Data Selection
    * for Language Models via Importance Resampling"): word bigrams
    * hashed into a FIXED number of buckets. The fixed bucket count is
    * the scale trick — both n-gram models collapse to ≤ NumBuckets
    * rows no matter the corpus size, so the weight table is always
    * broadcastable by construction (no budget guard needed, unlike
    * the contamination eval set). Prime, so the pmod spreads hash
    * structure. */
  val NumBuckets = 10007L

  /** Exact-substring span-dedup parameters (the ExactSubstr variant
    * of Lee et al., ACL'22 "Deduplicating Training Data Makes
    * Language Models Better" — public algorithm; the reference
    * architecture there is a suffix array, re-expressed here as a
    * k-gram seed-and-extend join, the shape that distributes):
    * [[SubK]]-token seed grams, spans reported at ≥ [[MinSpan]]
    * tokens, and grams appearing in more than [[MaxDf]] distinct
    * docs — or more than [[MaxPostings]] total positions — excluded
    * as stop-grams. The two caps together are the scale guard: a
    * boilerplate gram shared by a million docs (or repeated a million
    * times inside two docs) would otherwise emit a quadratic
    * posting-list self-join; capping BOTH axes bounds every block at
    * C(MaxPostings, 2) pairs, and real span dedup drops those grams
    * anyway (they are boilerplate, not provenance). */
  val SubK = 8
  val MinSpan = 12
  val MaxDf = 16L

  /** Total-postings cap per seed gram, closing the hole [[MaxDf]]
    * alone leaves: df counts DISTINCT docs, so a gram repeated 10⁶
    * times inside each of two pathological docs ("spam spam spam …")
    * still passes df = 2 and would emit 10¹² position pairs from ONE
    * hash. Capping total occurrences bounds every block at
    * C(MaxPostings, 2) pairs; a gram past the cap is degenerate
    * repetition, not provenance — the same stop-gram rationale as the
    * df cap, applied to the other axis. */
  val MaxPostings = 128L

  /** Fixed-point scale for the importance ratio (same convention as
    * [[LmScale]]) and a deterministic clamp on a single feature's
    * weight: with uniform bucket loading the ratio is O(target/raw
    * fraction), but a near-empty raw bucket could mint one huge
    * weight and swamp a doc's sum — the clamp caps any feature at
    * 1000× scale, identically in both engines. */
  val DsirScale = 1000000L
  val DsirWCap = 1000000000L

  /** Per-source selection depth for text_dsir_sample. */
  val DsirTopK = 50L

  /** Per-train-doc DSIR importance scores (doc_id, n_feats,
    * weight_sum, dsir_score), unordered — shared by
    * text_dsir_weights and text_dsir_sample; see the query scaladoc
    * for the design. */
  private def dsirScores(s: SparkSession, d: String): DataFrame = {
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 2 THEN
          |  transform(sequence(1, size(ws)-1),
          |    i -> concat(ws[i-1], ' ', ws[i]))
          |ELSE array() END""".stripMargin)).as("bgram"))
      .select(col("doc_id"),
        pmod(xxhash64(col("bgram")), lit(NumBuckets)).as("b"))
      .persist()
    val isEval = col("doc_id") % 50 === 0
    // both n-gram models from ONE bucket-keyed aggregate (conditional
    // counts), restricted to buckets the raw split actually uses
    val wt = bg.groupBy("b")
      .agg(count(when(isEval, 1)).as("ct"),
        count(when(!isEval, 1)).as("cr"))
      .filter(col("cr") > 0)
      .select(col("b"), least(
        expr(s"((ct + 1L) * $DsirScale) div (cr + 1L)"),
        lit(DsirWCap)).as("w"))
    bg.filter(!isEval).join(broadcast(wt), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("w").as("weight_sum"))
      .withColumn("dsir_score",
        col("weight_sum").cast("double") / col("n_feats").cast("double"))
  }

  /** Body of text_contamination_overlap with the broadcast budget as a
    * parameter (`private[graft]` so ContaminationSpec can assert both
    * ship strategies — the GraphQueries.step pattern). */
  private[graft] def contaminationOverlap(s: SparkSession, d: String,
      budget: Long): DataFrame = {
    val (fps, _) = winnowed(s, d)
    val isEval = col("doc_id") % 50 === 0
    // 1-row scalar: upper bound on eval fingerprint rows (n_fps ≤
    // nk per doc) from the documents projection alone
    val evalKgrams = Tables.documents(s, d).filter(isEval)
      .agg(coalesce(sum(greatest(lit(0),
        size(split(lower(col("text")), " ")) - WinK + 1).cast("long")),
        lit(0L)))
      .head.getLong(0)
    val evalFps = fps.filter(isEval)
      .select(col("mh"), col("doc_id").as("eval_id")).distinct()
    val trainFps = fps.filter(!isEval)
      .select(col("doc_id"), col("mh")).distinct()
    val evalSide =
      if (evalKgrams <= budget) broadcast(evalFps) else evalFps
    trainFps.join(evalSide, "mh")
      .groupBy("doc_id")
      .agg(countDistinct(col("mh")).as("n_shared_fps"),
        countDistinct(col("eval_id")).as("n_eval_docs_hit"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact-substring span dedup (Lee et al. ACL'22, ExactSubstr):
    // maximal shared token spans ≥ MinSpan between doc pairs, found
    // by seed-and-extend — hash every SubK-token gram with its
    // position, equi-join rare grams (df ≤ MaxDf) on the hash, then
    // collapse runs of consecutive matches on the same alignment
    // DIAGONAL (pa − pb) into maximal spans via gaps-and-islands: a
    // run of m consecutive seed matches is a shared span of
    // m + SubK − 1 tokens. Every stage is keyed: the gram join on the
    // 64-bit hash (df-capped), the island window on (pair, diagonal)
    // — candidate-pair-sized, never corpus-wide, no global sort until
    // the final presentation orderBy. The suffix array the paper
    // builds is a single-machine structure; the seed-and-extend join
    // is the shape that survives a 1000-executor shuffle.
    "dedup_substr_spans" -> ((s, d) => {
      val kg = graft.Spread.fanoutScan(Tables.documents(s, d))
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        .select(col("doc_id"), posexplode(expr(
          s"""CASE WHEN size(ws) >= $SubK THEN
             |  transform(sequence(0, size(ws)-$SubK),
             |    p -> concat_ws(' ', slice(ws, p+1, $SubK)))
             |ELSE array() END""".stripMargin)))
        .select(col("doc_id"), col("pos").cast("long").as("p"),
          xxhash64(col("col")).as("h"))
      val rare = kg.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("occ"))
        .filter(col("df") <= MaxDf && col("occ") <= MaxPostings)
        .select("h")
      val seeds = kg.join(rare, Seq("h"), "left_semi")
      val m = seeds.select(col("h"), col("doc_id").as("doc_a"),
          col("p").as("pa"))
        .join(seeds.select(col("h"), col("doc_id").as("doc_b"),
          col("p").as("pb")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb")
      val diag = m.withColumn("diag", col("pa") - col("pb"))
      val isl = diag.withColumn("isl", col("pa") -
        row_number().over(Window.partitionBy("doc_a", "doc_b", "diag")
          .orderBy("pa")))
      isl.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(min("pa").as("a_start"), min("pb").as("b_start"),
          (count(lit(1)) + SubK - 1).as("span_tokens"))
        .filter(col("span_tokens") >= MinSpan)
        .select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
        .orderBy("doc_a", "doc_b", "a_start", "b_start")
    }),

    // Per-doc n-gram novelty: the fraction of a doc's distinct word
    // WinK-grams whose global FIRST occurrence (minimum doc_id over
    // all docs containing the gram) is this doc — the forward-dedup /
    // data-pruning signal: a doc with novelty ~0 contributes nothing
    // the corpus (in ingestion order) hasn't already seen, the
    // streaming-dedup decision expressed as a batch score. Scale
    // shape: one explode to distinct (doc, gram-hash) pairs, a
    // min-aggregate on the 64-bit hash, a key join back, a per-doc
    // aggregate — every shuffle keys on the hash or doc_id; the text
    // never shuffles. Fixed-point ppm keeps both engines integral.
    "text_ngram_novelty" -> ((s, d) => {
      // (r15 A/B: the Spread.fanout pre-explode spread tried here
      // regressed ~0.7 s — the distinct's exchange already follows
      // immediately and the added exchange outweighed the map spread)
      val kg = Tables.documents(s, d)
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          s"""CASE WHEN size(ws) >= $WinK THEN
             |  transform(sequence(0, size(ws)-$WinK),
             |    p -> concat_ws(' ', slice(ws, p+1, $WinK)))
             |ELSE array() END""".stripMargin)).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("h")).distinct()
      val first = kg.groupBy("h").agg(min("doc_id").as("first_doc"))
      kg.join(first, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_grams"))
        .orderBy("doc_id")
    }),

    // PII redaction over the documents table — every 7th doc plants a
    // deterministic synthetic contact line (the fixture-plant pattern:
    // both engines construct the identical string, so the scrub
    // always has true positives), then emails and ≥6-digit runs are
    // replaced with typed placeholders. Map-only over the corpus; the
    // digest proves the exact scrubbed text without megabyte rows.
    "text_pii_scrub" -> ((s, d) => {
      val planted = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail"), col("doc_id") % 13, lit(".com ref "),
          col("doc_id") * 7919))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .withColumn("raw", planted)
        .withColumn("no_email",
          regexp_replace(col("raw"), EmailRe, "<EMAIL>"))
        .withColumn("scrubbed",
          regexp_replace(col("no_email"), IdRe, "<ID>"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("no_email"), lit(IdRe), lit(0)))
            .cast("long").as("n_ids"),
          (length(col("raw")) - length(col("scrubbed")))
            .cast("long").as("n_chars_removed"),
          md5(col("scrubbed").cast("binary")).as("scrubbed_digest"))
        .orderBy("doc_id")
    }),

    // Bigram-LM plausibility scoring — the CCNet-style "does this doc
    // look like the corpus" quality signal (Wenzek et al. LREC'20 use
    // LM perplexity; here the LM is the corpus's own bigram model and
    // the score is the mean conditional probability in exact ppm
    // integers, so the whole pipeline is engine-exact: floats would
    // make the per-doc sum order-dependent, ppm = cb·10⁶ div cu keeps
    // every term integral and the ONLY float op is the final mean's
    // one IEEE division). Scale shape: the text explodes once to
    // bigram occurrences; the model is two aggregates on the bigram/
    // prefix keys; scoring joins occurrences back on those keys —
    // key-partitioned shuffle joins over token-sized rows, the
    // document text itself never shuffles. Docs shorter than 2 words
    // have no bigrams and drop out (none in this corpus).
    "text_bigram_lm_score" -> ((s, d) =>
      lmDocScores(s, d)
        .withColumn("lm_score",
          col("sum_ppm").cast("double") / col("n_bigrams").cast("double"))
        .select("doc_id", "n_bigrams", "sum_ppm", "lm_score")
        .orderBy("doc_id")),

    // CCNet-style quality bucketing (Wenzek et al. LREC'20): split
    // each LANGUAGE's documents into head/middle/tail terciles by LM
    // score — the standard curation triage that trains on the head,
    // samples the middle, and drops the tail. The score is the bigram
    // LM's integer fixed-point per-doc average (s = Σppm·1000 div n),
    // so tercile THRESHOLDS come from exact rank selection over the
    // per-language (score → count) value-count table — the
    // stat_mann_whitney pattern — never an ntile window over raw
    // docs. Since round-12 wave 6 the cumulative itself is the
    // two-level bucketed prefix sum (the agg_percentiles_disc shape):
    // a window partitioned only by LANGUAGE holds every distinct
    // score of that language in ONE task (scores are near-unique per
    // doc, so that partition is doc-count-sized at 100 TB); bucketing
    // by s div 10⁶ over the BOUNDED score domain [0, 10⁹] caps every
    // within-bucket window at 10⁶ rows and the per-language base
    // window at ~10³ bucket rows — both constants. The per-language
    // total is an aggregate + broadcast join, not a whole-partition
    // window. The threshold table that routes every doc is languages
    // × 2 values, broadcast. t1/t2 are the smallest scores whose
    // cumulative count reaches n/3 and 2n/3; buckets are closed on
    // the left at those cuts, so every engine places boundary docs
    // identically — pure integer compares end to end.
    "text_ccnet_buckets" -> ((s, d) => {
      val sc = lmDocScores(s, d)
        .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
        .withColumn("s", expr("sum_ppm * 1000 div n_bigrams"))
      val vc = sc.groupBy("lang", "s").agg(count(lit(1)).as("cnt"))
        .withColumn("sb", expr("s div 1000000"))
      val bases = vc.groupBy("lang", "sb").agg(sum("cnt").as("bt"))
        .withColumn("base", coalesce(sum("bt").over(
          Window.partitionBy("lang").orderBy("sb")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("lang", "sb", "base")
      val n = vc.groupBy("lang").agg(sum("cnt").as("n"))
      val cum = vc.join(broadcast(bases), Seq("lang", "sb"))
        .withColumn("cum", col("base") + sum("cnt").over(
          Window.partitionBy("lang", "sb").orderBy("s")))
        .join(broadcast(n), "lang")
      val thr = cum.groupBy("lang").agg(
        min(when(col("cum") * 3 >= col("n"), col("s"))).as("t1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("s"))).as("t2"))
      sc.join(broadcast(thr), "lang")
        .withColumn("bucket",
          when(col("s") <= col("t1"), "tail")
            .when(col("s") <= col("t2"), "middle")
            .otherwise("head"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min("s").as("min_s"), max("s").as("max_s"))
        .orderBy("lang", "bucket")
    }),

    // Winnowing document fingerprints (Schleimer et al. SIGMOD'03 —
    // the MOSS algorithm): hash every word k-gram, then keep, from
    // each window of WinW consecutive k-gram hashes, the minimum
    // (rightmost position on ties — the robust-winnowing rule). Any
    // two documents sharing a run of WinK+WinW−1 words share a
    // fingerprint, with ≈2/(WinW+1) density — the guaranteed-recall
    // substring-dedup primitive between exact segment dedup and
    // MinHash. Scale shape: one explode to k-gram hashes (xxhash64 —
    // oracle-replayable), a W-way bounded fan to the covering window
    // starts, then plain per-(doc, window) aggregates — no per-doc
    // global window, every shuffle keys on (doc, window). The per-doc
    // summary digests the fingerprint SET (count + XOR + positions)
    // so the driver hash pins every selected fingerprint without
    // megabyte rows.
    // Cross-SOURCE content leakage matrix: for every source pair, how
    // many distinct winnowing fingerprints they share — the audit
    // that catches one feed mirroring another (scraped re-posts,
    // aggregator duplication) before mixture planning double-counts
    // the shared text. Same fingerprint key join as contamination
    // detection, lifted to the source level: fps collapse to DISTINCT
    // (source, fp) first (a source re-using its own boilerplate
    // contributes once), fingerprints shared by more than
    // [[MaxFpSources]] sources are dropped as boilerplate hubs (the
    // prefix-filter/MaxFanout cap pattern — a universal header would
    // otherwise emit C(n_sources, 2) pairs per fp), and the pair join
    // keys on the fingerprint value. Output is bounded by source
    // pairs, never corpus size.
    "text_source_overlap" -> ((s, d) => {
      val (fps, _) = winnowed(s, d)
      val srcFp = fps
        .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        .select("source", "mh").distinct()
      val fanOk = srcFp.groupBy("mh").agg(count(lit(1)).as("nf"))
        .filter(col("nf") <= MaxFpSources).select("mh")
      val capped = srcFp.join(fanOk, Seq("mh"), "left_semi")
      capped.as("a").join(capped.as("b"),
          col("a.mh") === col("b.mh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared_fps"))
        .orderBy("source_a", "source_b")
    }),

    "text_winnowing" -> ((s, d) => {
      val (fps, nk) = winnowed(s, d)
      nk.join(fps.groupBy("doc_id").agg(
          count(lit(1)).as("n_fps"), expr("bit_xor(mh)").as("fp_xor"),
          min("fp_p").as("first_p"), max("fp_p").as("last_p")),
        Seq("doc_id"), "left")
        .select(col("doc_id"), col("nk").as("n_kgrams"),
          coalesce(col("n_fps"), lit(0L)).as("n_fps"),
          col("fp_xor"), col("first_p"), col("last_p"))
        .orderBy("doc_id")
    }),

    // Benchmark CONTAMINATION detection via winnowing fingerprints —
    // the cross-set form of the decontamination problem: which
    // training documents share verbatim runs (≥ WinK+WinW−1 words,
    // the winnowing guarantee) with the held-out eval set? Eval :=
    // doc_id % 50 == 0 (a deterministic ~2% "benchmark" subset), train
    // := the rest; a train doc is flagged with the count of shared
    // fingerprints and of eval docs hit. Scale shape: the join keys on
    // the FINGERPRINT value — the train side is the winnowed
    // fingerprint set (≈ 2/(WinW+1) of corpus tokens) and no doc text
    // is ever compared pairwise. The eval side ships broadcast only
    // under [[BroadcastFpBudget]] (checked via the cheap eval k-gram
    // upper bound); above it the join degrades to a plain keyed
    // shuffle on mh — same budget-then-degrade as PageRank.
    // Complements text_decontaminate's exact 13-gram containment with
    // the sparser guaranteed-recall fingerprint form.
    "text_contamination_overlap" ->
      ((s, d) => contaminationOverlap(s, d, BroadcastFpBudget)),

    // DSIR importance weights (Xie et al. NeurIPS'23): score every
    // raw/train document by how much its hashed-bigram distribution
    // looks like the target split (doc_id % 50 — the same held-out
    // subset contamination uses, here as the domain to SELECT toward).
    // Feature = pmod(xxhash64(bigram), NumBuckets); per-bucket weight
    // = (target_count+1)·scale div (raw_count+1) (add-1 smoothed
    // count ratio — the normalizing totals are global constants that
    // don't change the ranking, so the ratio stays exact integer);
    // doc score = mean weight over its bigram occurrences. Scale
    // shape: the corpus explodes to bigram occurrences ONCE (persisted
    // — ~16 B/occurrence, far smaller than re-tokenizing the text for
    // each of the three consumers; the harness clears the cache
    // between queries); both count tables and the weight table are
    // ≤ NumBuckets rows BY CONSTRUCTION, so the scoring join is a
    // bounded broadcast at any corpus size; the only corpus-sized
    // shuffles key on bucket (bounded key space → perfect partial
    // aggregation) and doc_id.
    "text_dsir_weights" -> ((s, d) =>
      dsirScores(s, d).orderBy("doc_id")),

    // The resampling half of DSIR: per SOURCE, the top-K train docs by
    // importance score (ties broken by doc_id — the order is total, so
    // both engines rank identically). A partitioned window over the
    // per-doc score table — doc-count-sized rows of 4 columns, keyed
    // on source; the corpus-scale work all happens inside dsirScores.
    "text_dsir_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      dsirScores(s, d)
        .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("dsir_score").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= DsirTopK)
        .select("source", "rk", "doc_id", "dsir_score")
        .orderBy("source", "rk")
    }),

    // Heaps-law telemetry: cumulative (tokens, distinct vocabulary)
    // at ~100 doc-id checkpoints — the dataset card's vocabulary
    // growth curve, and the statistic that says when a crawl stops
    // contributing new types. Scale shape: first-seen-doc per term is
    // ONE aggregate on the term key (the only corpus-sized shuffle);
    // both per-checkpoint tables are checkpoint-count-sized, so the
    // final cumulative window runs over ≤ ~100 rows by construction
    // (see [[Checkpoints]]) — bounded, not corpus-proportional.
    "text_heaps_law" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // 1-row scalar: checkpoint width from the id span. isNullAt
      // guards the empty corpus (max over zero rows is NULL and
      // getLong would NPE - the sample_pps_systematic precedent);
      // width 1 degrades to the oracle's empty result. The literal
      // IS [[Checkpoints]], interpolated so tuning the val cannot
      // silently fork the twins. Spelled floor(mx/C)+1 — the SAME
      // value as ceil((mx+1)/C) for every mx ≥ 0 but overflow-free
      // (the naive mx+1 wraps for hashed ids near Long.MaxValue and
      // would collapse the width to 1, the data-sized bucket table
      // the derivation exists to prevent — the ppsBucketWidth lesson;
      // the double-division spelling also loses integer precision
      // past 2^53).
      val mx = docs.agg(max("doc_id")).head
      val w = if (mx.isNullAt(0)) 1L
        else math.max(1L, mx.getLong(0) / Checkpoints + 1L)
      val lws = TextOps.words(lower(col("text")))
      val tc = docs
        .select(expr(s"doc_id div $w").as("bucket"),
          size(lws).cast("long").as("nt"))
        .groupBy("bucket")
        .agg(sum("nt").as("toks"), count(lit(1)).as("n_docs"))
      val nt = docs
        .select(col("doc_id"), explode(lws).as("term"))
        .groupBy("term").agg(min("doc_id").as("fd"))
        .groupBy(expr(s"fd div $w").as("bucket"))
        .agg(count(lit(1)).as("new_terms"))
      val cum = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tc.join(nt, Seq("bucket"), "left")
        .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
        .select(col("bucket"), col("n_docs"),
          sum("toks").over(cum).as("cum_tokens"),
          sum("new_terms").over(cum).as("cum_vocab"))
        .orderBy("bucket")
    }))

  /** Shared winnowing-fingerprint oracle CTE chain (through `fps` =
    * (doc_id, fp_p, mh) and `nk`), the SQL twin of [[winnowed]]. */
  private def winnowFpsSql: String =
    s"""ws AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |    unnest(range(1, len(w) - $WinK + 2)) AS g
       |  FROM ws WHERE len(w) >= $WinK),
       |kgsrc AS (
       |  SELECT doc_id, g - 1 AS p,
       |    array_to_string(w[g:g+${WinK - 1}], ' ') AS s0
       |  FROM pos),
       |${XxhSql.ctes("kgsrc", Seq("doc_id", "p"), "s0", "kh")},
       |nk AS (
       |  SELECT doc_id,
       |    CAST(greatest(0, len(w) - $WinK + 1) AS BIGINT) AS nk
       |  FROM ws),
       |fan AS (
       |  SELECT k.doc_id, k.p, k.hv,
       |    unnest(range(greatest(0, k.p - ${WinW - 1}), k.p + 1)) AS j
       |  FROM kh_out k),
       |vfan AS (
       |  SELECT f.* FROM fan f JOIN nk USING (doc_id)
       |  WHERE f.j <= nk.nk - $WinW),
       |mn AS (SELECT doc_id, j, min(hv) AS mh
       |       FROM vfan GROUP BY doc_id, j),
       |sel AS (
       |  SELECT v.doc_id, v.j, m.mh, max(v.p) AS fp_p
       |  FROM vfan v JOIN mn m
       |    ON m.doc_id = v.doc_id AND m.j = v.j AND v.hv = m.mh
       |  GROUP BY v.doc_id, v.j, m.mh),
       |fps AS (SELECT DISTINCT doc_id, fp_p, mh FROM sel)""".stripMargin

  /** Shared DSIR oracle CTE chain ending in `dsw` = (doc_id, n_feats,
    * weight_sum, dsir_score) — the SQL twin of [[dsirScores]]. */
  private def dsirSql: String =
    s"""ws AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, w, unnest(range(2, len(w)+1)) AS i
       |  FROM ws WHERE len(w) >= 2),
       |bsrc AS (
       |  SELECT doc_id, i, w[i-1] || ' ' || w[i] AS s0 FROM pos),
       |${XxhSql.ctes("bsrc", Seq("doc_id", "i"), "s0", "bh")},
       |occ AS (
       |  SELECT doc_id,
       |    ((hv % $NumBuckets) + $NumBuckets) % $NumBuckets AS b
       |  FROM bh_out),
       |ct AS (SELECT b, count(*) AS ct FROM occ
       |  WHERE doc_id % 50 = 0 GROUP BY b),
       |cr AS (SELECT b, count(*) AS cr FROM occ
       |  WHERE doc_id % 50 <> 0 GROUP BY b),
       |wt AS (
       |  SELECT cr.b,
       |    least(((coalesce(ct.ct, 0) + 1) * $DsirScale) // (cr.cr + 1),
       |      $DsirWCap) AS w
       |  FROM cr LEFT JOIN ct ON cr.b = ct.b),
       |dsw AS (
       |  SELECT o.doc_id, count(*) AS n_feats,
       |    CAST(sum(wt.w) AS BIGINT) AS weight_sum,
       |    CAST(sum(wt.w) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      AS dsir_score
       |  FROM occ o JOIN wt USING (b)
       |  WHERE o.doc_id % 50 <> 0
       |  GROUP BY o.doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(
    "text_ngram_novelty" ->
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS w
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, w, unnest(range(1, len(w) - $WinK + 2)) AS g
         |  FROM ws WHERE len(w) >= $WinK),
         |nvsrc AS (
         |  SELECT doc_id, g - 1 AS p,
         |    array_to_string(w[g:g+${WinK - 1}], ' ') AS s0
         |  FROM pos),
         |${XxhSql.ctes("nvsrc", Seq("doc_id", "p"), "s0", "nv")},
         |kg AS (SELECT DISTINCT doc_id, hv FROM nv_out),
         |fst AS (SELECT hv, min(doc_id) AS first_doc FROM kg GROUP BY hv)
         |SELECT kg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN fst.first_doc = kg.doc_id
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST((sum(CASE WHEN fst.first_doc = kg.doc_id
         |    THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT)
         |    AS novelty_ppm
         |FROM kg JOIN fst USING (hv)
         |GROUP BY kg.doc_id ORDER BY kg.doc_id""".stripMargin,
    // honest twin of the seed-and-extend span join: same xxhash64
    // seeds (XxhSql replay), same df cap, same diagonal islands
    "dedup_substr_spans" ->
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS w
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, w, unnest(range(1, len(w) - $SubK + 2)) AS g
         |  FROM ws WHERE len(w) >= $SubK),
         |sgsrc AS (
         |  SELECT doc_id, g - 1 AS p,
         |    array_to_string(w[g:g+${SubK - 1}], ' ') AS s0
         |  FROM pos),
         |${XxhSql.ctes("sgsrc", Seq("doc_id", "p"), "s0", "sg")},
         |rare AS (SELECT hv FROM sg_out
         |  GROUP BY hv HAVING count(DISTINCT doc_id) <= $MaxDf
         |    AND count(*) <= $MaxPostings),
         |sd AS (SELECT k.* FROM sg_out k JOIN rare USING (hv)),
         |m AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.p AS pa, b.p AS pb
         |  FROM sd a JOIN sd b
         |    ON a.hv = b.hv AND a.doc_id < b.doc_id),
         |il AS (
         |  SELECT *, pa - pb AS diag,
         |    pa - row_number() OVER (
         |      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
         |  FROM m),
         |sp AS (
         |  SELECT doc_a, doc_b,
         |    CAST(min(pa) AS BIGINT) AS a_start,
         |    CAST(min(pb) AS BIGINT) AS b_start,
         |    CAST(count(*) + $SubK - 1 AS BIGINT) AS span_tokens
         |  FROM il GROUP BY doc_a, doc_b, diag, isl)
         |SELECT doc_a, doc_b, a_start, b_start, span_tokens
         |FROM sp WHERE span_tokens >= $MinSpan
         |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin,
    "text_contamination_overlap" ->
      s"""WITH $winnowFpsSql,
         |ev AS (SELECT DISTINCT mh, doc_id AS eval_id FROM fps
         |  WHERE doc_id % 50 = 0),
         |tr AS (SELECT DISTINCT doc_id, mh FROM fps
         |  WHERE doc_id % 50 <> 0)
         |SELECT doc_id, count(DISTINCT tr.mh) AS n_shared_fps,
         |  count(DISTINCT eval_id) AS n_eval_docs_hit
         |FROM tr JOIN ev ON tr.mh = ev.mh
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_pii_scrub" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN
         |      text || ' contact user' || doc_id || '@mail' ||
         |      (doc_id % 13) || '.com ref ' || (doc_id * 7919)
         |    ELSE text END AS raw
         |  FROM documents),
         |s1 AS (SELECT doc_id, raw,
         |    regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g') AS no_email
         |  FROM p),
         |s2 AS (SELECT doc_id, raw, no_email,
         |    regexp_replace(no_email, '$IdRe', '<ID>', 'g') AS scrubbed
         |  FROM s1)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '$EmailRe')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(no_email, '$IdRe')) AS BIGINT)
         |    AS n_ids,
         |  CAST(length(raw) - length(scrubbed) AS BIGINT)
         |    AS n_chars_removed,
         |  md5(scrubbed) AS scrubbed_digest
         |FROM s2 ORDER BY doc_id""".stripMargin,

    "text_bigram_lm_score" ->
      s"""$lmDocScoresSqlCtes
         |SELECT doc_id, n_bigrams, sum_ppm,
         |  CAST(sum_ppm AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS lm_score
         |FROM lm ORDER BY doc_id""".stripMargin,

    "text_ccnet_buckets" ->
      s"""$lmDocScoresSqlCtes,
         |scd AS (
         |  SELECT lm.doc_id, d.lang,
         |    (lm.sum_ppm * 1000) // lm.n_bigrams AS s
         |  FROM lm JOIN documents d USING (doc_id)),
         |vc AS (SELECT lang, s, count(*) AS cnt
         |       FROM scd GROUP BY lang, s),
         |cum AS (
         |  SELECT lang, s, cnt,
         |    sum(cnt) OVER (PARTITION BY lang ORDER BY s) AS cum,
         |    sum(cnt) OVER (PARTITION BY lang) AS n
         |  FROM vc),
         |thr AS (
         |  SELECT lang,
         |    min(CASE WHEN cum * 3 >= n THEN s END) AS t1,
         |    min(CASE WHEN cum * 3 >= n * 2 THEN s END) AS t2
         |  FROM cum GROUP BY lang)
         |SELECT scd.lang,
         |  CASE WHEN s <= t1 THEN 'tail'
         |       WHEN s <= t2 THEN 'middle'
         |       ELSE 'head' END AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(s) AS BIGINT) AS min_s, CAST(max(s) AS BIGINT) AS max_s
         |FROM scd JOIN thr USING (lang)
         |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    "text_dsir_weights" ->
      s"""WITH $dsirSql
         |SELECT doc_id, n_feats, weight_sum, dsir_score
         |FROM dsw ORDER BY doc_id""".stripMargin,

    "text_dsir_sample" ->
      s"""WITH $dsirSql,
         |src AS (
         |  SELECT dsw.*, d.source,
         |    CAST(row_number() OVER (PARTITION BY d.source
         |      ORDER BY dsw.dsir_score DESC, dsw.doc_id) AS BIGINT) AS rk
         |  FROM dsw JOIN documents d USING (doc_id))
         |SELECT source, rk, doc_id, dsir_score FROM src
         |WHERE rk <= $DsirTopK ORDER BY source, rk""".stripMargin,

    "text_source_overlap" ->
      s"""WITH $winnowFpsSql,
         |sfp AS (
         |  SELECT DISTINCT d.source, f.mh
         |  FROM fps f JOIN documents d USING (doc_id)),
         |fok AS (SELECT mh FROM sfp GROUP BY mh
         |        HAVING count(*) <= $MaxFpSources),
         |cap AS (SELECT sfp.source, sfp.mh FROM sfp JOIN fok USING (mh))
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_shared_fps
         |FROM cap a JOIN cap b ON a.mh = b.mh AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    "text_winnowing" ->
      s"""WITH $winnowFpsSql,
         |agg AS (
         |  SELECT doc_id, count(*) AS n_fps, bit_xor(mh) AS fp_xor,
         |    min(fp_p) AS first_p, max(fp_p) AS last_p
         |  FROM fps GROUP BY doc_id)
         |SELECT n.doc_id, n.nk AS n_kgrams,
         |  coalesce(a.n_fps, 0) AS n_fps, a.fp_xor, a.first_p, a.last_p
         |FROM nk n LEFT JOIN agg a USING (doc_id)
         |ORDER BY n.doc_id""".stripMargin,

    "text_heaps_law" ->
      s"""WITH wd AS (
        |  SELECT greatest(1, max(doc_id) // $Checkpoints + 1) AS w
        |  FROM documents),
        |tc AS (
        |  SELECT doc_id // (SELECT w FROM wd) AS bucket,
        |    CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS toks,
        |    count(*) AS n_docs
        |  FROM documents GROUP BY doc_id // (SELECT w FROM wd)),
        |fs AS (
        |  SELECT term, min(doc_id) AS fd
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |        FROM documents)
        |  GROUP BY term),
        |nt AS (
        |  SELECT fd // (SELECT w FROM wd) AS bucket,
        |    count(*) AS new_terms
        |  FROM fs GROUP BY fd // (SELECT w FROM wd))
        |SELECT tc.bucket, tc.n_docs,
        |  CAST(sum(tc.toks) OVER (ORDER BY tc.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(coalesce(nt.new_terms, 0)) OVER (ORDER BY tc.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM tc LEFT JOIN nt USING (bucket) ORDER BY tc.bucket""".stripMargin)
}
