package graft.llm

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      // 1-row scalar: checkpoint width from the id span
      val w = math.max(1L, math.ceil(
        (docs.agg(max("doc_id")).head.getLong(0) + 1) / 100.0).toLong)
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

  def oracles: Map[String, String] = Map(
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

    "text_heaps_law" ->
      """WITH wd AS (
        |  SELECT greatest(1, CAST(ceil((max(doc_id)+1)/100.0) AS BIGINT))
        |    AS w
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
