package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of queries whose driver checks only see
  * well-formed rows: an empty document (n_frames = 0) and an all-zero
  * embedding (no symmetric quantization scale). Fixtures are written
  * as table-shaped parquet dirs so the real `SparkEntry.queries`
  * entries run unmodified.
  */
class QueryEdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft_edge").toString

  test("multimodal_frame_sample: empty document emits no frames, no crash") {
    val dir = fixtureDir()
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "x" * 300, "en", "web", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("multimodal_frame_sample")(spark, dir)
      .select("doc_id", "frame_idx").as[(Long, Long)].collect()
    // doc 1 (empty -> sequence would be (0,-1)) contributes nothing,
    // matching DuckDB's empty range(0, 0, 4); doc 2 has 2 frames,
    // stride 4 samples only frame 0.
    assert(out.toSeq == Seq((2L, 0L)))
  }

  test("curation queries survive empty and single-word documents") {
    val dir = fixtureDir()
    Seq(
      (1L, "", "en", "web", 0L),                       // -> words = [""]
      (2L, "lone", "en", "web", 4L),                   // no bigrams
      (3L, ("the word " * 30).trim, "en", "web", 269L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")

    val rep = SparkEntry.queries("text_repetition")(spark, dir)
      .orderBy("doc_id").collect()
    assert(rep.length == 3)
    // one-token docs: no bigrams -> NULL bigram fracs, never a crash
    assert(rep(0).isNullAt(rep(0).fieldIndex("top_bigram_frac")))
    assert(rep(1).isNullAt(rep(1).fieldIndex("top_bigram_frac")))
    assert(rep(2).getDouble(rep(2).fieldIndex("dup_word_frac")) > 0.9)

    val gate = SparkEntry.queries("text_gopher_filter")(spark, dir)
      .orderBy("doc_id").collect()
    assert(gate.forall(_.getLong(gate.head.fieldIndex("keep")) == 0L))

    val pack = SparkEntry.queries("text_pack_sequences")(spark, dir)
      .orderBy("doc_id").collect()
    // the empty doc still occupies one token slot ([""]), offsets tile
    assert(pack.map(_.getLong(pack.head.fieldIndex("n_tokens"))).sum ==
      1L + 1L + 60L)

    val scrub = SparkEntry.queries("text_scrub")(spark, dir)
      .orderBy("doc_id").collect()
    assert(scrub(0).getLong(scrub(0).fieldIndex("n_hits")) == 0L)
    assert(scrub(0).getLong(scrub(0).fieldIndex("n_chars_clean")) == 0L)
  }

  test("token ids and rarity scores survive empty and repeated-word documents") {
    val dir = fixtureDir()
    Seq(
      (1L, "", "en", "web", 0L),                    // words = [""]
      (2L, "aa aa aa", "en", "web", 8L),            // one repeated token
      (3L, "aa zz", "en", "web", 5L))               // zz is a hapax
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")

    val ids = SparkEntry.queries("text_token_ids")(spark, dir)
      .orderBy("doc_id").collect()
    assert(ids.length == 3)
    // vocab by (tf desc, term asc): "aa" tf=4 -> id 1, "" tf=1 -> id 2,
    // "zz" tf=1 -> id 3; doc 2 = [1,1,1], doc 3 = [1,3]
    assert(ids(1).getLong(ids(1).fieldIndex("n_tokens")) == 3L)
    assert(ids(1).getLong(ids(1).fieldIndex("ids_sum")) == 3L)
    assert(ids(2).getLong(ids(2).fieldIndex("ids_sum")) == 4L)

    val rare = SparkEntry.queries("text_rare_token_score")(spark, dir)
      .orderBy("doc_id").collect()
    // doc 3 holds the corpus' only "zz" -> one hapax, min_df 1
    assert(rare(2).getLong(rare(2).fieldIndex("n_hapax")) == 1L)
    assert(rare(2).getLong(rare(2).fieldIndex("min_df")) == 1L)
    // doc 2's single distinct token appears in two docs -> min_df 2
    assert(rare(1).getLong(rare(1).fieldIndex("min_df")) == 2L)
  }

  test("multimodal_batch_plan tiles each mime contiguously by start offset") {
    val dir = fixtureDir()
    // 6 docs of 2000 bytes: batch = start-offset div 4096, so an item
    // STARTING inside the budget may overhang it (bounded by one item)
    // — starts 0,2000,4000 land in batch 0; 6000,8000 in batch 1;
    // 10000 in batch 2
    Seq.tabulate(6)(i => (i.toLong, "x" * 2000, "en", "web", 2000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("multimodal_batch_plan")(spark, dir)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("batch_id")),
        r.getLong(r.fieldIndex("n_items")),
        r.getLong(r.fieldIndex("batch_bytes")),
        r.getLong(r.fieldIndex("first_doc")),
        r.getLong(r.fieldIndex("last_doc")))).sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 3L, 6000L), (1L, 2L, 4000L), (2L, 1L, 2000L)))
    // batches are contiguous doc ranges with no overlap, and no batch
    // exceeds budget + one item
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4)
      case _ =>
    }
    assert(rows.forall(_._3 <= 4096L + 2000L))
  }

  test("text_mattr equals a straight Scala sliding-window derivation") {
    val dir = fixtureDir()
    // one long doc (window slides), one exactly window-sized, one
    // short (plain-TTR fallback), one pathological repeat
    val w = TextQueries.MattrWindow
    val long = (1 to 120).map(i => s"t${i % 37}").mkString(" ")
    val exact = (1 to w).map(i => s"u$i").mkString(" ")
    val short = "only four tiny words"
    val rep = Seq.fill(80)("same").mkString(" ")
    Seq((1L, long, "en", "web", long.length.toLong),
        (2L, exact, "en", "web", exact.length.toLong),
        (3L, short, "en", "web", short.length.toLong),
        (4L, rep, "en", "web", rep.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_mattr")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(3), r.getLong(4))).toMap
    for ((id, text) <- Seq(1L -> long, 2L -> exact, 3L -> short,
        4L -> rep)) {
      val ts = text.split(" ", -1)
      val n = ts.length
      val (isShort, ppm) =
        if (n >= w) {
          val dsum = (0 to n - w)
            .map(i => ts.slice(i, i + w).distinct.length.toLong).sum
          (false, dsum * 1000000L / ((n - w + 1).toLong * w))
        } else (true, ts.distinct.length.toLong * 1000000L / n)
      assert(got(id) == ((n.toLong, isShort, ppm)), s"doc $id")
    }
    // the repeat doc's MATTR collapses to 1/W, the long doc's stays high
    assert(got(4L)._3 == 1000000L / w)
    assert(got(1L)._3 > 500000L)
  }

  test("sim_quantize_int8: zero vector quantizes to NULL stats") {
    val dir = fixtureDir()
    Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(1.0f, -2.0f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("sim_quantize_int8")(spark, dir)
      .orderBy("vec_id").collect()
    val zero = rows(0)
    assert(zero.getLong(0) == 1L)
    assert(zero.isNullAt(rows(0).fieldIndex("scale")), "zero vector: NULL scale")
    assert(zero.isNullAt(rows(0).fieldIndex("q_min")))
    assert(zero.isNullAt(rows(0).fieldIndex("q_max")))
    assert(zero.isNullAt(rows(0).fieldIndex("q_sum")), "0*Inf=NaN must not cast to 0")
    val live = rows(1)
    // max-|x| component is -2.0 -> floor(-127 + 0.5) = -127
    assert(live.getLong(live.fieldIndex("q_min")) == -127L,
      "max-|x| component quantizes to exactly +/-127")
  }

  test("text_boilerplate_affixes: an empty text in a source yields prefix_len 0") {
    // Spark's sequence(1, 0) infers step -1 and returns [1, 0] - NOT
    // empty like DuckDB's range(1, 1) - so an unguarded lcp scanned
    // position 0 and emitted prefix_len -1 (plus a negative substr
    // length); the l = 0 short-circuit pins the oracle's 0
    val dir = fixtureDir()
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "shared header text", "en", "web", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_boilerplate_affixes")(spark, dir)
      .collect().head
    assert(r.getLong(r.fieldIndex("prefix_len")) == 0L)
    assert(r.getLong(r.fieldIndex("suffix_len")) == 0L)
    assert(r.getString(r.fieldIndex("prefix_sample")) == "")
  }

  test("dedup CC and heaps-law survive a corpus with zero near-dup pairs") {
    // sum() over an empty node set is NULL - the CC convergence probe
    // and the heaps checkpoint-width pre-pass both read it driver-side
    // and NPE'd before the coalesce/isNullAt guards
    val dir = fixtureDir()
    Seq(
      (1L, "utterly unique first text", "en", "web", 24L),
      (2L, "completely different words here", "en", "web", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("dedup_components")(spark, dir).count() == 0L)
    assert(SparkEntry.queries("text_heaps_law")(spark, dir).count() >= 1L)
    // and the fully-empty corpus path
    val dir2 = fixtureDir()
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir2/documents.parquet")
    assert(SparkEntry.queries("dedup_components")(spark, dir2).count() == 0L)
    assert(SparkEntry.queries("text_heaps_law")(spark, dir2).count() == 0L)
  }
}
