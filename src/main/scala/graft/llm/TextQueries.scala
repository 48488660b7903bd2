package graft.llm

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps._

/** Text-analysis operators over `documents` (north star): token
  * counting, quality scoring, language ID, fingerprinting. All pure
  * per-row column expressions — map-only, no shuffle, scale-free.
  */
object TextQueries extends QuerySuite {

  /** Top-K cut for the Zipf constancy audit. */
  val ZipfTopK = 50

  /** Sliding-window size (tokens) for MATTR lexical diversity. */
  val MattrWindow = 50

  /** Top-K terms profiled by the burstiness (VMR) audit. */
  val BurstTopK = 20

  /** Vocab sizes probed by the coverage curve (text_vocab_coverage). */
  val VocabCheckpoints = Seq(10L, 100L, 1000L, 10000L, 100000L)

  /** Collocation mining: adjacent bigrams below this count are hapax
    * noise (their lift estimate is dominated by chance) and drop
    * before ranking. */
  val PmiMinPairCount = 5L

  /** Collocations reported (lift-ranked). */
  val PmiTopK = 30

  /** Keywords tagged per document (text_doc_keywords). */
  val DocKeywordK = 3

  /** BM25 geometry: the 3 query terms are the corpus terms at
    * df-ranks [[BmTermRanks]] (deterministic mid-frequency picks —
    * the very top ranks are stopword-like with idf ≈ 1), scored with
    * k1 = [[BmK1]], b = 0.75. [[BmK1p1]] (= k1+1) and [[Bm1mB]]
    * (= 1−b) are their OWN literals: 1.2+1.0 and 1.0−0.75 in double
    * do not round to the literals 2.2 and 0.25, and the oracle writes
    * the literals. Linear idf (N−df+0.5)/(df+0.5) — the exponential
    * of Robertson's log idf — per the suite's no-log() determinism
    * contract (see text_tfidf_top_terms). */
  val BmTermRanks = Seq(10, 20, 30)
  val BmK1 = 1.2
  val BmK1p1 = 2.2
  val Bm1mB = 0.25
  val BmB = 0.75
  val BmTopK = 15

  // The lang-ID classifier, defined ONCE and shared by text_lang_id
  // and its confusion audit — so the audit can never drift from the
  // classifier it measures. (Spark column + DuckDB CASE twins.)
  private def langHits = {
    val ws = words(lower(col("text")))
    (markerCount(ws, EnMarkers), markerCount(ws, DeMarkers),
      markerCount(ws, EsMarkers))
  }
  private def guessedLang(en: org.apache.spark.sql.Column,
      de: org.apache.spark.sql.Column, es: org.apache.spark.sql.Column) =
    when(greatest(en, de, es) === 0, "und")
      .when(en >= de && en >= es, "en")
      .when(de >= es, "de")
      .otherwise("es")
  private val langCaseSql =
    """CASE WHEN greatest(en_hits, de_hits, es_hits) = 0 THEN 'und'
      |     WHEN en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
      |     WHEN de_hits >= es_hits THEN 'de'
      |     ELSE 'es' END""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Shared boilerplate affixes per source — the crawl-template
    // detector (every page of a shard opening with the same header /
    // closing with the same footer). Order-theory shortcut: over any
    // string set, the common prefix of ALL strings equals the common
    // prefix of just the lexicographic MIN and MAX — so the corpus
    // reduces to TWO strings per source in one aggregate (suffixes via
    // the same trick on reversed text), and the per-source LCP scan is
    // a linear character HOF on those two strings only.
    "text_boilerplate_affixes" -> ((s, d) => {
      def lcp(a: Column, b: Column): Column = {
        val l = least(length(a), length(b))
        val firstMismatch = array_min(filter(sequence(lit(1), l),
          i => a.substr(i, lit(1)) =!= b.substr(i, lit(1))))
        // l = 0 (an empty text in the group) must short-circuit:
        // Spark's sequence(1, 0) infers step -1 and yields [1, 0] —
        // NOT empty like DuckDB's range(1, 1) — so the scan would
        // "mismatch" at position 0 and emit prefix_len −1 (and a
        // negative substr length downstream)
        when(l === 0, lit(0L))
          .otherwise(coalesce(firstMismatch - 1, l).cast("long"))
      }
      Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          min(col("text")).as("mn"), max(col("text")).as("mx"),
          min(reverse(col("text"))).as("rmn"),
          max(reverse(col("text"))).as("rmx"))
        .select(col("source"), col("n_docs"),
          lcp(col("mn"), col("mx")).as("prefix_len"),
          lcp(col("rmn"), col("rmx")).as("suffix_len"),
          col("mn").substr(lit(1),
            least(lcp(col("mn"), col("mx")), lit(24L)).cast("int"))
            .as("prefix_sample"))
        .orderBy("source")
    }),

    // Token counting: whitespace tokens + BPE-ish regex tokens +
    // exact mean token length.
    "text_token_stats" -> ((s, d) => {
      val ws = words(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(ws).cast("long").as("n_words"),
        size(regexTokens(col("text"))).cast("long").as("n_regex_tokens"),
        size(array_distinct(ws)).cast("long").as("n_vocab"),
        (aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double")
          / size(ws)).as("mean_word_len"))
        .orderBy("doc_id")
    }),

    // Quality scoring: length/punctuation/stopword/repetition ratios
    // combined into one deterministic score.
    "text_quality_scores" -> ((s, d) => {
      val ws = words(col("text"))
      val nWords = size(ws).cast("double")
      val stopRatio = markerCount(ws, EnMarkers).cast("double") / nWords
      val vocabRatio = size(array_distinct(ws)).cast("double") / nWords
      // nullif-fold the zero-char doc (rows present, zero bytes — the
      // layout_partition_stats class): ANSI aborts on DOUBLE x/0 too,
      // so a reachable n_chars = 0 must degrade to NULL ratios in
      // both twins, never to a query abort
      val punct = size(regexp_extract_all(col("text"), lit("""[^\w\s]"""), lit(0)))
        .cast("double") / expr("CAST(nullif(n_chars, 0) AS DOUBLE)")
      Tables.documents(s, d).select(
        col("doc_id"),
        stopRatio.as("stop_ratio"),
        vocabRatio.as("vocab_ratio"),
        punct.as("punct_ratio"),
        (vocabRatio * 0.5 + stopRatio * 0.3 + (lit(1.0) - punct) * 0.2)
          .as("quality"))
        .orderBy("doc_id")
    }),

    // Language ID: n-gram/stopword-marker heuristic — argmax of
    // marker-family hit counts with 'und' (undetermined) fallback.
    "text_lang_id" -> ((s, d) => {
      val (en, de, es) = langHits
      Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("labeled_lang"),
        en.as("en_hits"), de.as("de_hits"), es.as("es_hits"),
        guessedLang(en, de, es).as("guessed_lang"))
        .orderBy("doc_id")
    }),

    // Lang-ID evaluation: confusion matrix of guessed vs labeled
    // language — the accuracy audit of the heuristic classifier above
    // (the text twin of sim_recall_audit: every model-ish operator
    // ships with its measurement). One scan + a tiny aggregate.
    "text_lang_confusion" -> ((s, d) => {
      val (en, de, es) = langHits
      Tables.documents(s, d).select(
        col("lang").as("labeled_lang"),
        guessedLang(en, de, es).as("guessed_lang"))
        .groupBy("labeled_lang", "guessed_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("labeled_lang", "guessed_lang")
    }),

    // Cohen's kappa of the lang-ID heuristic vs the labeled language
    // — the chance-corrected agreement scalar on top of
    // text_lang_confusion's matrix (Cohen, Educ. Psychol. Meas.
    // 1960). Fully integer: κ = (N·D − P) / (N² − P) with D = Σ
    // diagonal counts and P = Σ_category row_total·col_total, so the
    // only float op is the final division (accuracy = D/N
    // alongside). Categories appearing in only one margin contribute
    // 0 to P (their other margin is empty), which the inner
    // margin-join encodes. Scale shape: one corpus scan to the
    // ≤|langs|² confusion matrix; all later steps are matrix-sized.
    // Headroom: N² < 2⁶³ to ~3·10⁹ docs.
    "text_langid_kappa" -> ((s, d) => {
      val (en, de, es) = langHits
      val cm = Tables.documents(s, d).select(
        col("lang").as("labeled_lang"),
        guessedLang(en, de, es).as("guessed_lang"))
        .groupBy("labeled_lang", "guessed_lang")
        .agg(count(lit(1)).as("c"))
      val rt = cm.groupBy("labeled_lang").agg(sum("c").as("rt"))
      val ct = cm.groupBy("guessed_lang").agg(sum("c").as("ct"))
      val p = rt.join(ct, col("labeled_lang") === col("guessed_lang"))
        .agg(coalesce(sum(col("rt") * col("ct")), lit(0L)).as("p"))
      val nd = cm.agg(sum("c").as("n"),
        sum(when(col("labeled_lang") === col("guessed_lang"), col("c"))
          .otherwise(0L)).as("diag"))
      nd.crossJoin(broadcast(p)).select(
        col("n"), col("diag"), col("p").as("chance_prod"),
        when(col("n") * col("n") - col("p") === 0L,
          lit(null).cast("double"))
          .otherwise((col("n") * col("diag") - col("p")).cast("double") /
            (col("n") * col("n") - col("p")).cast("double")).as("kappa"),
        (col("diag").cast("double") / col("n").cast("double"))
          .as("accuracy"))
    }),

    // Document fingerprint: md5 over the sorted distinct vocabulary
    // (order-insensitive content identity).
    "text_fingerprints" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        vocabFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    // Vocabulary-coverage curve — the tokenizer-budget question asked
    // before fixing any vocab size: what share of all token
    // OCCURRENCES do the top-V most frequent terms cover, at
    // checkpoint sizes V = [[VocabCheckpoints]]? Ties at the boundary
    // frequency are handled EXACTLY (and order-independently): within
    // a frequency class every term covers the same count n, so the
    // top-V coverage is cum_occ(classes above) + (V − cum_terms
    // (above))·n — no tie-break order can change the answer, which is
    // what makes the curve engine-exact. Scale shape: the corpus
    // collapses to term counts (one shuffle on term), then to the
    // COUNT-OF-COUNTS table keyed by frequency value; the only
    // windows are the Mann-Whitney-style two-level prefix sums over
    // frequency-value buckets (power-law corpora have ≪ vocab
    // distinct frequency values, and the bucketed form parallelizes
    // even if they didn't); checkpoints are a 5-row broadcast spine,
    // so a checkpoint past the whole vocabulary degrades to total
    // coverage instead of dropping the row.
    "text_vocab_coverage" -> ((s, d) => {
      val tc = Tables.documents(s, d)
        .select(explode(words(lower(col("text")))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
      val cc = tc.groupBy("n").agg(count(lit(1)).as("n_terms"))
        .withColumn("occ", col("n") * col("n_terms"))
      val bk = cc.withColumn("bk", expr("n div 1000"))
      val base = bk.groupBy("bk")
        .agg(sum("n_terms").as("bt"))
        .withColumn("base_t", coalesce(sum("bt").over(
          Window.orderBy(col("bk").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bk", "base_t")
      val cum = bk.join(broadcast(base), "bk")
        .withColumn("above_t", col("base_t") + coalesce(
          sum("n_terms").over(Window.partitionBy("bk")
            .orderBy(col("n").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = cc.agg(sum("n_terms").as("total_terms"),
        sum("occ").as("total_occ"))
      val spine = s.range(1).select(explode(
        array(VocabCheckpoints.map(v => lit(v)): _*)).as("vocab_size"))
      // per-checkpoint coverage as ONE associative aggregate over the
      // (count-of-counts × 5-checkpoint) cross — classes fully inside
      // the top-V contribute their whole occ, the boundary class its
      // pro-rata share, classes below nothing; a V past the whole
      // vocabulary sums to total_occ with no special case
      cum.crossJoin(broadcast(spine))
        .groupBy("vocab_size")
        .agg(sum(
          when(col("above_t") + col("n_terms") <= col("vocab_size"),
            col("occ"))
            .when(col("above_t") < col("vocab_size"),
              (col("vocab_size") - col("above_t")) * col("n"))
            .otherwise(lit(0L))).as("covered_occ"))
        .crossJoin(broadcast(tot))
        .select(col("vocab_size"), col("total_terms"), col("total_occ"),
          col("covered_occ"),
          // integer headroom, ENFORCED: covered_occ·10⁶ is an
          // OCCURRENCE-scale product (~10¹³ tokens at 100 TB → 10¹⁹,
          // past 2⁶² at ~4.6·10¹² occurrences); bound from the exact
          // total_occ sum, which itself stays far under wrap
          graft.analytics.Exact.momentGuard(s, "text_vocab_coverage",
            "total_occ*1e6",
            coalesce(col("total_occ"), lit(0L)).cast("double") * lit(1.0e6))(
            expr("covered_occ * 1000000 div total_occ")).as("coverage_ppm"))
        .orderBy("vocab_size")
    }),

    // Collocation mining by pointwise-mutual-information LIFT (Church
    // & Hanks 1990's association ratio, kept linear per the suite's
    // no-log() contract: lift = P(xy)/(P(x)·P(y)) = n_xy·N/(n_x·n_y)
    // over the adjacent-bigram population — log of it is PMI, and
    // log is monotone, so the lift ranking IS the PMI ranking):
    // which word pairs co-occur far above chance. Marginals are the
    // bigram table's own left/right sums (so P(x)·P(y) is the
    // independence baseline of the same population). Scale shape:
    // map-only bigram extraction (two array slices zipped — no
    // self-join on position), one (x,y)-keyed count shuffle, vocab-
    // keyed marginal joins AFTER the min-count filter cuts the pair
    // table, and a distributed TakeOrdered top-K — no global window,
    // no driver loop. Lift is one fixed float tree over exact
    // integers; ties at the cut break (x, y)-lexicographic.
    "text_pmi_collocations" -> ((s, d) => {
      val bg = Tables.documents(s, d)
        .select(words(lower(col("text"))).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(zip_with(
          expr("slice(ws, 1, size(ws) - 1)"),
          expr("slice(ws, 2, size(ws) - 1)"),
          (x, y) => struct(x.as("x"), y.as("y")))).as("b"))
        .select(col("b.x").as("x"), col("b.y").as("y"))
      val cxy = bg.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      val cx = cxy.groupBy("x").agg(sum("n_xy").as("n_x"))
      val cy = cxy.groupBy("y").agg(sum("n_xy").as("n_y"))
      val n = cxy.agg(sum("n_xy").as("n_total"))
      cxy.filter(col("n_xy") >= PmiMinPairCount)
        .join(cx, "x").join(cy, "y")
        .crossJoin(broadcast(n))
        .withColumn("lift",
          (col("n_xy").cast("double") * col("n_total")) /
            (col("n_x").cast("double") * col("n_y")))
        .select("x", "y", "n_xy", "n_x", "n_y", "lift")
        .orderBy(col("lift").desc, col("x"), col("y"))
        .limit(PmiTopK)
    }),

    // Per-document keyword extraction — the metadata-enrichment twin
    // of text_tfidf_top_terms (that one ranks terms per SOURCE; this
    // tags each DOCUMENT with its top-[[DocKeywordK]] distinguishing
    // terms, the tags a curation pipeline stores beside the doc).
    // Same linear-idf contract: score = tf·N/df, one fixed float
    // tree; ties break term-lexicographic. Scale shape: one explode
    // feeds the (doc, term) tf table and the term df table; the join
    // is term-keyed (vocab-sized, never corpus²); the ONLY window is
    // partitioned by doc_id — per-partition sort fan is bounded by a
    // single document's vocabulary.
    "text_doc_keywords" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nDocs = docs.select(count(lit(1)).as("n_total"))
      val tok = docs.select(col("doc_id"),
        explode(words(lower(col("text")))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tok.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(df, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf").cast("double") * col("n_total") / col("df"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("term"))).cast("long"))
        .filter(col("rk") <= DocKeywordK)
        .select("doc_id", "rk", "term", "tf", "df", "score")
        .orderBy("doc_id", "rk")
    }),

    // Vocabulary audit: top-5 terms per source by document frequency
    // (distinct per doc, so one vote per document). Integer counts +
    // lexicographic tiebreak keep it bit-deterministic cross-engine.
    // Scale shape: explode -> two-level agg -> per-source top-k window
    // over the (source, term) count table, never the corpus.
    "text_top_terms" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"),
          explode(array_distinct(words(lower(col("text"))))).as("term"))
      tok.groupBy("source", "term").agg(count(lit(1)).as("df"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("df").desc, col("term"))).cast("long"))
        .filter(col("rk") <= 5)
        .select("source", "rk", "term", "df")
        .orderBy("source", "rk")
    }),

    // TF-IDF term ranking: top-5 terms per source by tf × (N/df) — the
    // classic distinguishing-term score next to text_top_terms' raw
    // document frequency. Linear idf (N/df instead of log(N/df)) keeps
    // every operation an exactly-rounded IEEE op (integer-valued
    // multiply, one division), so both engines produce bit-identical
    // doubles; log() is not correctly-rounded and may differ per libm.
    // Scale shape: one explode feeds both aggregates — (source, term)
    // totals and corpus-wide distinct-doc counts — then the join runs
    // on the small term table, never the corpus.
    "text_tfidf_top_terms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nDocs = docs.select(count(lit(1)).as("n_total"))
      val tok = docs.select(col("source"), col("doc_id"),
        explode(words(lower(col("text")))).as("term"))
      val tf = tok.groupBy("source", "term").agg(count(lit(1)).as("tf"))
      val df = tok.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(df, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          col("tf").cast("double") * col("n_total") / col("df"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("tfidf").desc, col("term"))).cast("long"))
        .filter(col("rk") <= 5)
        .select("source", "rk", "term", "tf", "df", "tfidf")
        .orderBy("source", "rk")
    }),

    // BM25 document ranking (Robertson & Zaragoza, FnTIR 2009) for a
    // deterministic 3-term query — THE lexical retrieval scorer, the
    // sparse half of every hybrid (BM25 + dense) stack. Linear idf
    // per the suite's no-log() contract (constants doc); the length
    // normalization ratio len/avgdl is the exact-integer cross form
    // len·N/T divided once. Scale shape: one explode to the
    // (doc, term) count table feeds everything — per-term df, per-doc
    // length, and the 3 query-term tfs (a semi-join-sized filter);
    // scoring is map-side after broadcasting the 1-row stats frame,
    // and the result is a TakeOrderedAndProject top-[[BmTopK]]. The
    // two tiny collects (30-term rank pick, 1-row totals) are
    // constant-size by construction. Tf columns are reported so the
    // score is auditable per document.
    "text_bm25_topk" -> ((s, d) => {
      val dtc = Tables.documents(s, d)
        .select(col("doc_id"), explode(words(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        .persist()
      val picks = dtc.groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term"))
        .limit(BmTermRanks.max).collect()
      if (picks.length < BmTermRanks.max) {
        // degenerate corpus (fewer distinct terms than the deepest
        // query rank): no scorable query — empty result, same schema
        import s.implicits._
        dtc.unpersist()
        Seq.empty[(Long, Long, Long, Long, Long, Double)]
          .toDF("doc_id", "n_tokens", "tf1", "tf2", "tf3", "score")
      } else {
      val terms = BmTermRanks.map(r =>
        (picks(r - 1).getString(0), picks(r - 1).getLong(1)))
      val dl = dtc.groupBy("doc_id").agg(sum("c").as("n_tokens"))
      val tot = dl.agg(count(lit(1)).as("nd"), sum("n_tokens").as("tot"))
        .collect().head
      val (nd, totTok) = (tot.getLong(0), tot.getLong(1))
      val tfCols = terms.zipWithIndex.map { case ((t, _), i) =>
        sum(when(col("term") === t, col("c")).otherwise(0L))
          .as(s"tf${i + 1}")
      }
      val tfs = dtc.filter(col("term").isin(terms.map(_._1): _*))
        .groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
      val ratio = (col("n_tokens") * nd).cast("double") /
        lit(totTok).cast("double")
      val ws = terms.zipWithIndex.map { case ((_, df), i) =>
        val idf = ((nd - df).toDouble + 0.5) / (df.toDouble + 0.5)
        val tfD = col(s"tf${i + 1}").cast("double")
        lit(idf) * (tfD * BmK1p1) /
          (tfD + lit(BmK1) * (lit(Bm1mB) + lit(BmB) * ratio))
      }
      dl.join(tfs, Seq("doc_id"), "left")
        .na.fill(0L, (1 to 3).map(i => s"tf$i"))
        .select(col("doc_id"), col("n_tokens"),
          col("tf1"), col("tf2"), col("tf3"),
          (ws(0) + ws(1) + ws(2)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(BmTopK)
      }
    }),

    // Deterministic train/val/test split — the reproducibility
    // primitive every training pipeline needs: assignment is a pure
    // function of the stable doc_id (first md5 hex byte: 00-bf train
    // ~75%, c0-e5 val ~15%, else test ~10%), so re-runs, engines and
    // backfills all agree; no RNG, no seed drift, map-only.
    "text_dataset_split" -> ((s, d) => {
      val bucket = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      val split = when(bucket < "c0", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
      Tables.documents(s, d)
        .select(col("lang"), split.as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")
    }),

    // Train→test n-gram coverage — "how much of the eval set's
    // surface does the training split even contain?", the
    // generalization-vs-memorization telemetry beside contamination
    // detection (which asks the opposite question). Splits use the
    // text_dataset_split hash rule; coverage = share of the TEST
    // split's distinct word trigrams present in the TRAIN split —
    // one explode per side reduced to DISTINCT n-grams, one left-semi
    // probe on the n-gram key, integer ppm. N-gram tables are
    // vocabulary-sized (≪ corpus); the corpus text never shuffles.
    "text_split_ngram_coverage" -> ((s, d) => {
      val bucket = substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      val split = when(bucket < "c0", "train")
        .when(bucket < "e6", "val").otherwise("test")
      val tri = Tables.documents(s, d)
        .select(split.as("split"), org.apache.spark.sql.functions
          .split(lower(col("text")), " ").as("ws"))
        .select(col("split"), explode(expr(
          """CASE WHEN size(ws) >= 3 THEN
            |  transform(sequence(2, size(ws) - 1),
            |    i -> concat_ws(' ', ws[i-2], ws[i-1], ws[i]))
            |ELSE array() END""".stripMargin)).as("g"))
      val train = tri.filter(col("split") === "train")
        .select("g").distinct()
      val test = tri.filter(col("split") === "test")
        .select("g").distinct()
      val covered = test.join(train, Seq("g"), "left_semi")
      test.agg(count(lit(1)).as("n_test_ngrams"))
        .crossJoin(broadcast(
          covered.agg(count(lit(1)).as("n_covered"))))
        .select(col("n_test_ngrams"), col("n_covered"),
          // nullif: zero test n-grams is an ANSI DIVIDE_BY_ZERO
          // abort otherwise; NULL coverage in both twins
          expr("n_covered * 1000000 div nullif(n_test_ngrams, 0)")
            .as("coverage_ppm"))
    }),

    // Occurrence-weighted OOV rate — the unigram companion to the
    // trigram coverage: what fraction of the TEST split's token
    // OCCURRENCES are types absent from the train vocabulary? This is
    // the number that predicts tokenizer fallback / LM <unk> pressure
    // (type-level coverage overweights rare junk). Test tokens reduce
    // to a (type → occurrence-count) table first, so the anti-join
    // against the train vocab is vocabulary-sized on both sides.
    "text_oov_rate" -> ((s, d) => {
      val bucket = substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      val split = when(bucket < "c0", "train")
        .when(bucket < "e6", "val").otherwise("test")
      val tok = Tables.documents(s, d)
        .select(split.as("split"),
          explode(org.apache.spark.sql.functions
            .split(lower(col("text")), " ")).as("t"))
      val trainVocab = tok.filter(col("split") === "train")
        .select("t").distinct()
      val testCounts = tok.filter(col("split") === "test")
        .groupBy("t").agg(count(lit(1)).as("c"))
      val oov = testCounts.join(trainVocab, Seq("t"), "left_anti")
      testCounts.agg(sum("c").as("n_test_tokens"),
          count(lit(1)).as("n_test_types"))
        .crossJoin(broadcast(oov.agg(
          coalesce(sum("c"), lit(0L)).as("n_oov_tokens"),
          count(lit(1)).as("n_oov_types"))))
        .select(col("n_test_tokens"), col("n_test_types"),
          col("n_oov_tokens"), col("n_oov_types"),
          // integer headroom, ENFORCED: the numerator is an
          // occurrence-scale sum ×10⁶ — the ~10% test split of a
          // 100 TB corpus (~1.4·10¹² tokens) leaves only ~3× margin
          // under 2⁶², so the guard fires before any growth past the
          // envelope can wrap (bound = the exact test-token sum)
          graft.analytics.Exact.momentGuard(s, "text_oov_rate",
            "n_test_tokens*1e6",
            coalesce(col("n_test_tokens"), lit(0L)).cast("double")
              * lit(1.0e6))(
            expr("n_oov_tokens * 1000000 div n_test_tokens"))
            .as("oov_ppm"))
    }),

    // Rare-token scoring: per-document corpus-frequency profile of its
    // distinct vocabulary — min document frequency (the rarest term),
    // hapax count (terms appearing in only this document), and mean df.
    // The rarity signal quality filters use to spot OCR garbage /
    // gibberish (lots of hapaxes) vs boilerplate (no rare terms).
    // Scale shape: one explode feeds the vocabulary df table (vocab ≪
    // corpus, Zipf), which joins back on term — the corpus text itself
    // never shuffles. All-integer counts + one final divide keep both
    // engines bit-identical.
    "text_rare_token_score" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(words(lower(col("text"))))).as("term"))
      val df = tok.groupBy("term").agg(count(lit(1)).as("df"))
      tok.join(df, Seq("term"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          min("df").as("min_df"),
          sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_hapax"),
          (sum("df").cast("double") / count(lit(1))).as("mean_df"))
        .orderBy("doc_id")
    }),

    // Corpus rollup: per (lang, source) token/char totals — the
    // "how big is my training set" query.
    "text_corpus_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("nw", size(words(col("text"))).cast("long"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("nw").as("total_words"),
          sum("n_chars").as("total_chars"),
          max("n_chars").as("max_chars"))
        .orderBy("lang", "source")),

    // Tokenizer fertility per language — tokens-per-word and
    // chars-per-token in integer ppm. The standard multilingual
    // tokenizer-bias audit (a tokenizer trained on English spends
    // 2-4× more tokens per word on under-represented scripts, which
    // silently taxes their effective context length and training
    // budget — cf. the fertility metric in the XLM/BLOOM tokenizer
    // papers). Scale shape: one map-side projection of per-doc
    // counts, one partial-agg groupBy on `lang` (cardinality ~ 10²)
    // — no join, no window; ratios are single integer divisions of
    // exact BIGINT sums. `words` of a non-empty string is never
    // empty (split(" ") yields [""] at worst) so total_words ≥
    // n_docs > 0 for every group; total_tokens CAN be 0 (whitespace
    // -only docs) and guards its division.
    "text_fertility_by_lang" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          size(words(col("text"))).cast("long").as("nw"),
          size(regexTokens(col("text"))).cast("long").as("nt"),
          col("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("nw").as("total_words"),
          sum("nt").as("total_tokens"),
          sum("n_chars").as("total_chars"))
        .select(col("lang"), col("n_docs"), col("total_words"),
          col("total_tokens"),
          // integer headroom, ENFORCED: both ppm numerators are
          // token/CHAR-scale sums ×10⁶ (chars ~10¹⁴ at 100 TB →
          // 10²⁰), crossing 2⁶² at ~4.6·10¹² per language — one
          // dominant language holds nearly the whole corpus, so this
          // is inside the envelope; bound = the larger exact sum
          graft.analytics.Exact.momentGuard(s, "text_fertility_by_lang",
            "max(total_tokens,total_chars)*1e6",
            greatest(col("total_tokens"),
              coalesce(col("total_chars"), lit(0L))).cast("double")
              * lit(1.0e6))(
            expr("total_tokens * 1000000 div total_words"))
            .as("fertility_ppm"),
          when(col("total_tokens") === 0L, lit(null).cast("long"))
            .otherwise(expr("total_chars * 1000000 div total_tokens"))
            .as("chars_per_token_ppm"))
        .orderBy("lang")),

    // Zipf's-law constancy audit over the corpus unigram frequencies:
    // for the top-[[ZipfTopK]] tokens, rank·freq should be ≈ constant
    // (≈ the rank-1 frequency), emitted as an integer ppm ratio —
    // the log-free Zipf check (log() is banned by the determinism
    // contract; rank·freq/C IS the Zipf-ness measure, exact). A
    // heavy-tailed corpus reads ≈ 10⁶ down the table; boilerplate-
    // or spam-dominated corpora bulge far above it. Scale shape: one
    // explode + partial-agg token count, then a TOP-K via
    // TakeOrderedAndProject (no global sort shuffle of the vocab
    // table) and a row_number window over the constant K rows.
    // Integer headroom: rank·freq·10⁶ < 2⁶³ holds while the top
    // token's count < 1.8·10¹¹ at K = 50; a 100 TB corpus (top token
    // ~10¹²) swaps the product to DECIMAL(38,0) — same plan shape.
    "text_zipf_constancy" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(words(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("freq"))
      val top = tf.orderBy(col("freq").desc, col("token")).limit(ZipfTopK)
      val w = Window.orderBy(col("freq").desc, col("token"))
      top.withColumn("rank", row_number().over(w).cast("long"))
        .crossJoin(broadcast(tf.agg(max("freq").as("c1"))))
        .select(col("rank"), col("token"), col("freq"),
          (col("rank") * col("freq")).as("rank_freq"),
          expr("rank * freq * 1000000 div c1").as("constancy_ppm"))
        .orderBy("rank")
    }),

    // Term burstiness (Church & Gale '95): variance-to-mean ratio of
    // per-document counts for the top-[[BurstTopK]] corpus terms —
    // content words clump ("bursty", VMR ≫ 1), function words spread
    // Poisson-like (VMR ≈ 1). The signal behind stopword discovery
    // and tf saturation choices, and a corpus-health read (boiler-
    // plate terms show pathological VMR). All integer: with S = Σc,
    // Q = Σc² over per-doc counts and N = total docs (zero-count
    // docs INCLUDED — that is what makes it a dispersion test),
    // VMR = (N·Q − S²)/(N·S) and the normalized burstiness
    // (VMR−1)/(VMR+1) = (N·Q−S²−N·S)/(N·Q−S²+N·S) — each ONE exact
    // integer division. Scale shape: token-count aggregate, TOP-K via
    // TakeOrderedAndProject, then per-doc counts ONLY for the K terms
    // via a broadcast semi-join — the corpus shuffles (term, doc)
    // pairs for K terms, never the full vocabulary. Headroom: N·Q
    // needs N·(per-doc c)²·N_docs_with < 2⁶³ — DECIMAL(38,0) swap
    // past ~10⁹ docs (StatQueries note).
    "text_burstiness" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(words(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val top = tok.groupBy("token").agg(count(lit(1)).as("total"))
        .orderBy(col("total").desc, col("token")).limit(BurstTopK)
      val mom = tok.join(broadcast(top.select("token")), Seq("token"),
          "left_semi")
        .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy("token").agg(sum("c").as("s"),
          sum(col("c") * col("c")).as("q"),
          count(lit(1)).as("n_docs_with"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("nn"))
      top.join(mom, "token").crossJoin(broadcast(nd))
        .select(col("token"), col("total"), col("n_docs_with"),
          ((col("nn") * col("q") - col("s") * col("s")).cast("double") /
            (col("nn") * col("s")).cast("double")).as("vmr"),
          ((col("nn") * col("q") - col("s") * col("s")
            - col("nn") * col("s")).cast("double") /
            (col("nn") * col("q") - col("s") * col("s")
              + col("nn") * col("s")).cast("double")).as("burstiness"))
        .orderBy(col("total").desc, col("token"))
    }),

    // Simpson lexical concentration per language (Simpson, Nature
    // 1949 — the log-free diversity index; Shannon entropy would cost
    // a libm log per type, the cross-engine hazard the suite bans):
    // D = Σ n_i(n_i−1) / (N(N−1)), the probability two tokens drawn
    // without replacement are the same type. A boilerplate- or
    // spam-heavy slice concentrates (D ↑) while organic prose stays
    // low — the corpus-health read beside burstiness (per-term) and
    // MATTR (per-doc): this one is per-SLICE. Exactness: numerator
    // and N are exact BIGINT aggregates; D is ONE double division of
    // a double product of exact integers (num/(N·(N−1)) — identical
    // IEEE tree in the oracle). Integer headroom, ENFORCED
    // ([[graft.analytics.Exact.momentGuard]]): Σ n_i(n_i−1) and the
    // per-type product are bounded a-priori by N·max_freq from the
    // same wrap-proof aggregate — a hot token (max_freq → N) pulls
    // the bound toward N², so a slice past ~2·10⁹ tokens with heavy
    // repetition raises loudly; DECIMAL swap per the StatQueries
    // header. Scale shape: one explode + map-side-combined (lang,
    // token) count, one lang-keyed reduce — nothing downstream is
    // data-sized.
    "text_simpson_diversity" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("lang"), explode(words(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      val m = tf.groupBy("lang").agg(
        sum("n").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("n") * (col("n") - 1L)).as("num"),
        max("n").as("maxn"))
      m.select(col("lang"),
        graft.analytics.Exact.momentGuard(s, "text_simpson_diversity",
          "N_tokens*max_freq",
          col("n_tokens").cast("double") * col("maxn").cast("double"))(
          col("n_tokens")).as("n_tokens"),
        col("n_types"), col("num").as("simpson_num"),
        when(col("n_tokens") < 2L, lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            (col("n_tokens").cast("double") *
              (col("n_tokens") - 1L).cast("double"))).as("simpson"))
        .orderBy("lang")
    }),

    // MATTR lexical diversity (moving-average type-token ratio,
    // Covington & McFall 2010): mean distinct-token count over all
    // [[MattrWindow]]-token sliding windows, in integer ppm — the
    // length-invariant replacement for raw TTR (which text_quality_
    // scores' vocab_ratio is, and which collapses as docs grow; MATTR
    // is comparable ACROSS document lengths, the property a corpus-
    // wide quality threshold needs). Exactness: the per-window
    // distinct counts are integers, summed exactly; ONE integer
    // division yields ppm. Docs shorter than the window fall back to
    // plain TTR and are flagged. Scale shape: pure per-row map (a
    // bounded O(n_tokens · W) fold inside the row) — no shuffle, no
    // state; embarrassingly parallel at any corpus size.
    "text_mattr" -> ((s, d) => {
      val W = MattrWindow
      Tables.documents(s, d)
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          size(array_distinct(col("ws"))).cast("long").as("n_types"),
          expr(
            s"""CASE WHEN size(ws) >= $W THEN
               |  aggregate(sequence(1, size(ws) - $W + 1), 0L,
               |    (acc, i) ->
               |      acc + CAST(size(array_distinct(slice(ws, i, $W)))
               |        AS BIGINT))
               |ELSE CAST(size(array_distinct(ws)) AS BIGINT)
               |END""".stripMargin).as("dsum"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          (col("n_tokens") < W).as("is_short"),
          when(col("n_tokens") >= W,
            expr(s"dsum * 1000000 div ((n_tokens - $W + 1) * $W)"))
            .otherwise(expr("dsum * 1000000 div n_tokens"))
            .as("mattr_ppm"))
        .orderBy("doc_id")
    }))

  private val enSetSql = EnMarkers.map(m => s"'$m'").mkString("[", ", ", "]")
  private val deSetSql = DeMarkers.map(m => s"'$m'").mkString("[", ", ", "]")
  private val esSetSql = EsMarkers.map(m => s"'$m'").mkString("[", ", ", "]")
  private def hitsSql(wsExpr: String, set: String): String =
    s"CAST(len(list_filter($wsExpr, x -> list_contains($set, x))) AS BIGINT)"

  def oracles: Map[String, String] = Map(
    "text_boilerplate_affixes" ->
      """WITH agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    min(text) AS mn, max(text) AS mx,
        |    min(reverse(text)) AS rmn, max(reverse(text)) AS rmx
        |  FROM documents GROUP BY source),
        |lens AS (
        |  SELECT source, n_docs, mn,
        |    CAST(coalesce(list_min(list_filter(
        |        range(1, least(len(mn), len(mx)) + 1),
        |        i -> substr(mn, i, 1) <> substr(mx, i, 1))) - 1,
        |      least(len(mn), len(mx))) AS BIGINT) AS prefix_len,
        |    CAST(coalesce(list_min(list_filter(
        |        range(1, least(len(rmn), len(rmx)) + 1),
        |        i -> substr(rmn, i, 1) <> substr(rmx, i, 1))) - 1,
        |      least(len(rmn), len(rmx))) AS BIGINT) AS suffix_len
        |  FROM agg)
        |SELECT source, n_docs, prefix_len, suffix_len,
        |  substr(mn, 1, CAST(least(prefix_len, 24) AS INTEGER))
        |    AS prefix_sample
        |FROM lens ORDER BY source""".stripMargin,

    "text_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
        |    AS n_regex_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_vocab,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |      w -> CAST(length(w) AS BIGINT))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS mean_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality_scores" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(${hitsSql("string_split(text, ' ')", enSetSql)} AS DOUBLE)
         |      / len(string_split(text, ' ')) AS stop_ratio,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS vocab_ratio,
         |    CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
         |      / CAST(nullif(n_chars, 0) AS DOUBLE) AS punct_ratio
         |  FROM documents)
         |SELECT doc_id, stop_ratio, vocab_ratio, punct_ratio,
         |  vocab_ratio * 0.5 + stop_ratio * 0.3 + (1.0 - punct_ratio) * 0.2
         |    AS quality
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang AS labeled_lang,
         |    ${hitsSql("string_split(lower(text), ' ')", enSetSql)} AS en_hits,
         |    ${hitsSql("string_split(lower(text), ' ')", deSetSql)} AS de_hits,
         |    ${hitsSql("string_split(lower(text), ' ')", esSetSql)} AS es_hits
         |  FROM documents)
         |SELECT doc_id, labeled_lang, en_hits, de_hits, es_hits,
         |  $langCaseSql AS guessed_lang
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_lang_confusion" ->
      s"""WITH t AS (
         |  SELECT lang AS labeled_lang,
         |    ${hitsSql("string_split(lower(text), ' ')", enSetSql)} AS en_hits,
         |    ${hitsSql("string_split(lower(text), ' ')", deSetSql)} AS de_hits,
         |    ${hitsSql("string_split(lower(text), ' ')", esSetSql)} AS es_hits
         |  FROM documents),
         |g AS (
         |  SELECT labeled_lang, $langCaseSql AS guessed_lang
         |  FROM t)
         |SELECT labeled_lang, guessed_lang, count(*) AS n_docs
         |FROM g GROUP BY 1, 2 ORDER BY labeled_lang, guessed_lang""".stripMargin,

    "text_langid_kappa" ->
      s"""WITH t AS (
         |  SELECT lang AS labeled_lang,
         |    ${hitsSql("string_split(lower(text), ' ')", enSetSql)} AS en_hits,
         |    ${hitsSql("string_split(lower(text), ' ')", deSetSql)} AS de_hits,
         |    ${hitsSql("string_split(lower(text), ' ')", esSetSql)} AS es_hits
         |  FROM documents),
         |g AS (SELECT labeled_lang, $langCaseSql AS guessed_lang FROM t),
         |cm AS (SELECT labeled_lang, guessed_lang,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM g GROUP BY 1, 2),
         |r AS (SELECT labeled_lang AS k, CAST(sum(c) AS BIGINT) AS rt
         |  FROM cm GROUP BY 1),
         |cl AS (SELECT guessed_lang AS k, CAST(sum(c) AS BIGINT) AS ct
         |  FROM cm GROUP BY 1),
         |p AS (SELECT CAST(coalesce(sum(rt * ct), 0) AS BIGINT) AS p
         |  FROM r JOIN cl USING (k)),
         |nd AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN labeled_lang = guessed_lang THEN c
         |      ELSE 0 END) AS BIGINT) AS diag
         |  FROM cm)
         |SELECT n, diag, p AS chance_prod,
         |  CASE WHEN n * n - p = 0 THEN NULL
         |       ELSE CAST(n * diag - p AS DOUBLE) /
         |            CAST(n * n - p AS DOUBLE) END AS kappa,
         |  CAST(diag AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy
         |FROM nd, p""".stripMargin,

    "text_fingerprints" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(lower(text), ' '))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_vocab_coverage" -> {
      val vals = VocabCheckpoints.mkString(", ")
      s"""WITH tc AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
         |        FROM documents)
         |  GROUP BY term),
         |cc AS (SELECT n, CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(n * count(*) AS BIGINT) AS occ
         |  FROM tc GROUP BY n),
         |cum AS (
         |  SELECT n, n_terms, occ,
         |    CAST(coalesce(sum(n_terms) OVER (ORDER BY n DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS above_t
         |  FROM cc),
         |tot AS (SELECT CAST(sum(n_terms) AS BIGINT) AS total_terms,
         |    CAST(sum(occ) AS BIGINT) AS total_occ FROM cc),
         |spine AS (SELECT unnest([$vals]) AS vocab_size),
         |cov AS (
         |  SELECT spine.vocab_size,
         |    CAST(sum(CASE
         |      WHEN cum.above_t + cum.n_terms <= spine.vocab_size
         |        THEN cum.occ
         |      WHEN cum.above_t < spine.vocab_size
         |        THEN (spine.vocab_size - cum.above_t) * cum.n
         |      ELSE 0 END) AS BIGINT) AS covered_occ
         |  FROM cum CROSS JOIN spine GROUP BY spine.vocab_size)
         |SELECT CAST(cov.vocab_size AS BIGINT) AS vocab_size,
         |  tot.total_terms, tot.total_occ, cov.covered_occ,
         |  CAST(cov.covered_occ * 1000000 // tot.total_occ AS BIGINT)
         |    AS coverage_ppm
         |FROM cov CROSS JOIN tot ORDER BY vocab_size""".stripMargin
    },

    "text_doc_keywords" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    unnest(string_split(lower(text), ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY doc_id, term),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |       FROM (SELECT DISTINCT doc_id, term FROM tok)
         |       GROUP BY term),
         |n AS (SELECT count(*) AS n_total FROM documents),
         |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    CAST(tf.tf AS DOUBLE) * n.n_total / df.df AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, term) AS rk FROM sc)
         |SELECT doc_id, rk, term, tf, df, score FROM r
         |WHERE rk <= $DocKeywordK ORDER BY doc_id, rk""".stripMargin,

    "text_pmi_collocations" ->
      s"""WITH dws AS (
         |  SELECT string_split(lower(text), ' ') AS ws FROM documents),
         |bg AS (
         |  SELECT b.x AS x, b.y AS y FROM (
         |    SELECT unnest(list_transform(range(1, len(ws)),
         |      i -> {'x': ws[i], 'y': ws[i + 1]})) AS b
         |    FROM dws)),
         |cxy AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
         |  FROM bg GROUP BY x, y),
         |cx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x
         |  FROM cxy GROUP BY x),
         |cy AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y
         |  FROM cxy GROUP BY y),
         |n AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_total FROM cxy)
         |SELECT cxy.x, cxy.y, cxy.n_xy, cx.n_x, cy.n_y,
         |  (CAST(cxy.n_xy AS DOUBLE) * n.n_total) /
         |    (CAST(cx.n_x AS DOUBLE) * cy.n_y) AS lift
         |FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN n
         |WHERE cxy.n_xy >= $PmiMinPairCount
         |ORDER BY lift DESC, x, y LIMIT $PmiTopK""".stripMargin,

    "text_top_terms" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS term
        |  FROM documents),
        |c AS (SELECT source, term, count(*) AS df FROM tok GROUP BY source, term),
        |r AS (SELECT source, term, df,
        |  row_number() OVER (PARTITION BY source ORDER BY df DESC, term) AS rk
        |  FROM c)
        |SELECT source, rk, term, df FROM r WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin,

    "text_tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |    unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT source, term, count(*) AS tf
        |       FROM tok GROUP BY source, term),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM tok)
        |       GROUP BY term),
        |n AS (SELECT count(*) AS n_total FROM documents),
        |sc AS (SELECT tf.source, tf.term, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) * n.n_total / df.df AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY tfidf DESC, term) AS rk FROM sc)
        |SELECT source, rk, term, tf, df, tfidf FROM r WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin,

    "text_bm25_topk" -> {
      val tCtes = BmTermRanks.zipWithIndex.map { case (r, i) =>
        s"t${i + 1} AS (SELECT term, df FROM pick WHERE rk = $r)"
      }.mkString(",\n")
      def tfExpr(i: Int) = s"CAST(coalesce(tf.tf$i, 0) AS DOUBLE)"
      val wExprs = (1 to 3).map { i =>
        s"""((CAST(nd - t$i.df AS DOUBLE) + 0.5) /
           |     (CAST(t$i.df AS DOUBLE) + 0.5)) *
           |    (${tfExpr(i)} * $BmK1p1) /
           |    (${tfExpr(i)} + $BmK1 * ($Bm1mB + $BmB *
           |      (CAST(dl.n_tokens * nd AS DOUBLE) /
           |       CAST(tot AS DOUBLE))))""".stripMargin
      }
      s"""WITH dtc AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
         |    FROM documents) GROUP BY doc_id, term),
         |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM dtc GROUP BY term),
         |pick AS (SELECT term, df,
         |    row_number() OVER (ORDER BY df DESC, term) AS rk
         |  FROM dfreq),
         |$tCtes,
         |dl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens
         |  FROM dtc GROUP BY doc_id),
         |tots AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         |    CAST(sum(n_tokens) AS BIGINT) AS tot FROM dl),
         |tf AS (SELECT dtc.doc_id,
         |    CAST(sum(CASE WHEN dtc.term = t1.term THEN c ELSE 0 END)
         |      AS BIGINT) AS tf1,
         |    CAST(sum(CASE WHEN dtc.term = t2.term THEN c ELSE 0 END)
         |      AS BIGINT) AS tf2,
         |    CAST(sum(CASE WHEN dtc.term = t3.term THEN c ELSE 0 END)
         |      AS BIGINT) AS tf3
         |  FROM dtc, t1, t2, t3 GROUP BY dtc.doc_id)
         |SELECT dl.doc_id, dl.n_tokens,
         |  CAST(coalesce(tf.tf1, 0) AS BIGINT) AS tf1,
         |  CAST(coalesce(tf.tf2, 0) AS BIGINT) AS tf2,
         |  CAST(coalesce(tf.tf3, 0) AS BIGINT) AS tf3,
         |  ${wExprs.mkString(" +\n  ")} AS score
         |FROM dl LEFT JOIN tf ON tf.doc_id = dl.doc_id, tots, t1, t2, t3
         |ORDER BY score DESC, dl.doc_id LIMIT $BmTopK""".stripMargin
    },

    "text_oov_rate" ->
      """WITH sp AS (
        |  SELECT
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
        |         THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'val'
        |         ELSE 'test' END AS split,
        |    unnest(string_split(lower(text), ' ')) AS t
        |  FROM documents),
        |tv AS (SELECT DISTINCT t FROM sp WHERE split = 'train'),
        |tc AS (SELECT t, CAST(count(*) AS BIGINT) AS c
        |       FROM sp WHERE split = 'test' GROUP BY t),
        |oov AS (
        |  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_oov_tokens,
        |    CAST(count(*) AS BIGINT) AS n_oov_types
        |  FROM tc WHERE t NOT IN (SELECT t FROM tv)),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_test_tokens,
        |    CAST(count(*) AS BIGINT) AS n_test_types
        |  FROM tc)
        |SELECT tot.n_test_tokens, tot.n_test_types,
        |  oov.n_oov_tokens, oov.n_oov_types,
        |  CAST(oov.n_oov_tokens * 1000000 // tot.n_test_tokens AS BIGINT)
        |    AS oov_ppm
        |FROM tot, oov""".stripMargin,

    "text_split_ngram_coverage" ->
      """WITH sp AS (
        |  SELECT
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
        |         THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'val'
        |         ELSE 'test' END AS split,
        |    string_split(lower(text), ' ') AS w
        |  FROM documents),
        |tri AS (
        |  SELECT split, unnest(list_transform(range(3, len(w) + 1),
        |    i -> w[i-2] || ' ' || w[i-1] || ' ' || w[i])) AS g
        |  FROM sp WHERE len(w) >= 3),
        |tr AS (SELECT DISTINCT g FROM tri WHERE split = 'train'),
        |te AS (SELECT DISTINCT g FROM tri WHERE split = 'test'),
        |cov AS (SELECT CAST(count(*) AS BIGINT) AS n_covered
        |        FROM te WHERE g IN (SELECT g FROM tr)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_test_ngrams FROM te)
        |SELECT tot.n_test_ngrams, cov.n_covered,
        |  CAST(cov.n_covered * 1000000
        |    // nullif(tot.n_test_ngrams, 0) AS BIGINT)
        |    AS coverage_ppm
        |FROM tot, cov""".stripMargin,

    "text_dataset_split" ->
      """WITH t AS (
        |  SELECT lang,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
        |         THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, count(*) AS n_docs
        |FROM t GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "text_rare_token_score" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS term
        |  FROM documents),
        |df AS (SELECT term, count(*) AS df FROM tok GROUP BY term)
        |SELECT tok.doc_id, count(*) AS n_terms, min(df.df) AS min_df,
        |  CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(sum(df.df) AS DOUBLE) / count(*) AS mean_df
        |FROM tok JOIN df USING (term)
        |GROUP BY tok.doc_id ORDER BY doc_id""".stripMargin,

    "text_corpus_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "text_fertility_by_lang" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
        |    CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
        |      AS nt,
        |    n_chars
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(nw) AS BIGINT) AS total_words,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  CAST(sum(nt) * 1000000 // sum(nw) AS BIGINT) AS fertility_ppm,
        |  CASE WHEN sum(nt) = 0 THEN NULL
        |       ELSE CAST(sum(n_chars) * 1000000 // sum(nt) AS BIGINT)
        |  END AS chars_per_token_ppm
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "text_simpson_diversity" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT lang, token, CAST(count(*) AS BIGINT) AS n
        |  FROM tok WHERE token <> '' GROUP BY 1, 2),
        |m AS (
        |  SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(n * (n - 1)) AS BIGINT) AS simpson_num
        |  FROM tf GROUP BY lang)
        |SELECT lang, n_tokens, n_types, simpson_num,
        |  CASE WHEN n_tokens < 2 THEN NULL
        |       ELSE CAST(simpson_num AS DOUBLE) /
        |            (CAST(n_tokens AS DOUBLE) *
        |             CAST(n_tokens - 1 AS DOUBLE)) END AS simpson
        |FROM m ORDER BY lang""".stripMargin,

    "text_zipf_constancy" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS freq
        |  FROM tok WHERE token <> '' GROUP BY token),
        |top AS (
        |  SELECT token, freq,
        |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
        |      AS rank
        |  FROM tf ORDER BY freq DESC, token LIMIT 50),
        |c AS (SELECT max(freq) AS c1 FROM tf)
        |SELECT rank, token, freq,
        |  CAST(rank * freq AS BIGINT) AS rank_freq,
        |  CAST(rank * freq * 1000000 // c1 AS BIGINT) AS constancy_ppm
        |FROM top, c ORDER BY rank""".stripMargin,

    "text_burstiness" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
         |top AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS total
         |  FROM tk GROUP BY token
         |  ORDER BY total DESC, token LIMIT $BurstTopK),
         |pd AS (
         |  SELECT tk.token, tk.doc_id, CAST(count(*) AS BIGINT) AS c
         |  FROM tk JOIN top ON tk.token = top.token
         |  GROUP BY tk.token, tk.doc_id),
         |mom AS (
         |  SELECT token, CAST(sum(c) AS BIGINT) AS s,
         |    CAST(sum(c * c) AS BIGINT) AS q,
         |    CAST(count(*) AS BIGINT) AS n_docs_with
         |  FROM pd GROUP BY token),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents)
         |SELECT top.token, top.total, mom.n_docs_with,
         |  CAST(nn * q - s * s AS DOUBLE) / CAST(nn * s AS DOUBLE)
         |    AS vmr,
         |  CAST(nn * q - s * s - nn * s AS DOUBLE) /
         |    CAST(nn * q - s * s + nn * s AS DOUBLE) AS burstiness
         |FROM top JOIN mom ON top.token = mom.token, nd
         |ORDER BY top.total DESC, top.token""".stripMargin,

    "text_mattr" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
         |    CASE WHEN len(ws) >= $MattrWindow THEN
         |      CAST(list_sum(list_transform(
         |        range(1, len(ws) - $MattrWindow + 2),
         |        i -> len(list_distinct(
         |          list_slice(ws, i, i + ${MattrWindow - 1})))))
         |        AS BIGINT)
         |    ELSE CAST(len(list_distinct(ws)) AS BIGINT) END AS dsum
         |  FROM t)
         |SELECT doc_id, n_tokens, n_types,
         |  n_tokens < $MattrWindow AS is_short,
         |  CAST(CASE WHEN n_tokens >= $MattrWindow
         |       THEN dsum * 1000000
         |            // ((n_tokens - $MattrWindow + 1) * $MattrWindow)
         |       ELSE dsum * 1000000 // n_tokens END AS BIGINT)
         |    AS mattr_ppm
         |FROM s ORDER BY doc_id""".stripMargin)
}
