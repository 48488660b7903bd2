package graft.llm

import graft.{QuerySuite, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import TextOps._

/** Byte-pair-encoding subword tokenization (Sennrich et al., ACL'16 —
  * public algorithm): learn a merge table from corpus statistics, then
  * numericalize text with it — the step that completes
  * tokenize→numericalize for a training-data pipeline (whitespace ids
  * live in `text_token_ids`; this is the learned-subword upgrade).
  *
  * Scale design (the reason BPE trains at 100 TB at all): training
  * runs over the WORD-TYPE table — (word, freq) distinct words with
  * counts — which is vocab-sized (Zipf), never the corpus. Each merge
  * round is one pair-explode + aggregate over that small table; the
  * driver holds only the single argmax pair per round (1-row collect,
  * the same mergeable-summary consumption pattern as the CMS sketch)
  * plus the final merge list, which is broadcast back for encoding.
  * Encoding is embarrassingly parallel: map-only over docs with the
  * merge table applied in learned order per word.
  */
object BpeQueries extends QuerySuite {

  /** Merges learned at test scale (a production vocab uses 30-60k). */
  val MergeBudget = 24

  /** End-of-word marker symbol (distinguishes "est</w>" from "est"). */
  val Eow = "</w>"

  case class WordSeq(word: String, freq: Long, syms: Seq[String])
  case class Merge(rank: Int, left: String, right: String, pair_n: Long)

  /** One greedy left-to-right pass replacing adjacent (a, b) with a+b —
    * the standard BPE merge application. Pure, shared by training and
    * encoding (and the spec's hand-check). */
  private[llm] def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Word → initial symbol sequence: characters + end-of-word marker. */
  private[llm] def initSyms(word: String): Seq[String] =
    word.map(_.toString) :+ Eow

  /** Apply a learned merge list in rank order to one word. */
  private[llm] def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(initSyms(word)) { case (syms, (a, b)) => mergeOnce(syms, a, b) }

  /** Train the merge table over a (word, freq) type table. Each round:
    * explode adjacent symbol pairs weighted by word freq, aggregate,
    * take the deterministic argmax (count desc, pair asc), rewrite the
    * symbol sequences map-side. The type table is persisted per round
    * with lineage truncated (same discipline as connectedComponents —
    * the plan tree must not grow by round). Stops early when no pair
    * repeats. */
  private[llm] def trainMerges(types: Dataset[WordSeq], budget: Int): Seq[Merge] = {
    import types.sparkSession.implicits._
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var cur = types.persist()
    cur.count()
    var round = 0
    var done = false
    while (round < budget && !done) {
      val top = cur.flatMap(w =>
          w.syms.sliding(2).collect { case Seq(a, b) => ((a, b), w.freq) })
        .toDF("pair", "n")
        .groupBy("pair").agg(sum("n").as("n"))
        .orderBy(col("n").desc, col("pair._1"), col("pair._2"))
        .head(1)
      val best = top.headOption.map(r =>
        (r.getStruct(0).getString(0), r.getStruct(0).getString(1), r.getLong(1)))
      best match {
        case Some((a, b, n)) if n >= 2 =>
          merges += Merge(round + 1, a, b, n)
          val next = cur.map(w => w.copy(syms = mergeOnce(w.syms, a, b)))
            .localCheckpoint(true)
          cur.unpersist()
          cur = next
          round += 1
        case _ => done = true
      }
    }
    cur.unpersist()
    merges.toSeq
  }

  /** The word-type table of a documents frame: distinct lowercase
    * whitespace words with corpus frequencies — vocab-sized (Zipf). */
  private def wordTypes(s: SparkSession, d: String): Dataset[WordSeq] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(words(lower(col("text")))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => WordSeq(w, f, initSyms(w)) }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The learned merge table: rank, pair, merged symbol, weighted
    // pair count at learn time. Deterministic (argmax tie-break is
    // total), so rows-only driver check + BpeSpec pin it.
    "text_bpe_vocab" -> ((s, d) => {
      import s.implicits._
      trainMerges(wordTypes(s, d), MergeBudget)
        .toDF()
        .select(col("rank").cast("long").as("merge_rank"),
          col("left"), col("right"),
          concat(col("left"), col("right")).as("merged"),
          col("pair_n"))
        .orderBy("merge_rank")
    }),

    // Subword numericalization with the learned merges: per doc, the
    // BPE token count, the whitespace word count it compresses, and a
    // digest of the exact token sequence (same surfaced-digest contract
    // as text_token_ids — the hash proves the sequence without
    // megabyte rows). Encoding is map-only: the merge list rides along
    // as a broadcast-sized Scala value.
    "text_bpe_encode" -> ((s, d) => {
      import s.implicits._
      val merges = trainMerges(wordTypes(s, d), MergeBudget)
        .map(m => (m.left, m.right))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val ws = text.toLowerCase.split(" ", -1).toSeq
          val toks = ws.flatMap(w => encodeWord(w, merges))
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(toks.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, ws.length.toLong, toks.length.toLong, digest)
        }
        .toDF("doc_id", "n_words", "n_tokens", "tokens_digest")
        .orderBy("doc_id")
    }))

  // Iterative merge training is not expressible as one DuckDB query
  // (each round's argmax feeds the next round's rewrite) — rows-only
  // driver checks; BpeSpec pins known merges on a planted corpus.
  def oracles: Map[String, String] = Map.empty
}
