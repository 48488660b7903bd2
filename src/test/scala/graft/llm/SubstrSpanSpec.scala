package graft.llm

import graft.SparkSpec

/** Planted-fixture guarantees for dedup_substr_spans: the
  * seed-and-extend diagonal-island construction must report EXACTLY
  * the maximal shared token spans — correct length, correct start
  * positions on both sides, split runs kept separate, sub-threshold
  * overlaps suppressed, and boilerplate grams above the df cap never
  * generating pairs.
  */
class SubstrSpanSpec extends SparkSpec {
  import MiningQueries.{SubK, MinSpan}

  private def write(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_span").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .repartition(2).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def spans(dir: String): Seq[(Long, Long, Long, Long, Long)] =
    MiningQueries.queries("dedup_substr_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  // distinct filler words so no accidental cross-matches
  private def toks(pfx: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$pfx$i")

  test("a planted shared run is reported once, with exact length and offsets") {
    val shared = toks("s", MinSpan + 3) // 15 shared tokens
    val a = (toks("a", 5) ++ shared ++ toks("b", 4)).mkString(" ")
    val b = (toks("c", 9) ++ shared ++ toks("d", 2)).mkString(" ")
    val got = spans(write(Seq(1L -> a, 2L -> b)))
    assert(got === Seq((1L, 2L, 5L, 9L, (MinSpan + 3).toLong)))
  }

  test("a one-token edit splits the run; sub-threshold halves are suppressed") {
    // 30 shared tokens, then doc 2 mutates token index 14 (0-based):
    // halves of 14 and 15 tokens — both >= MinSpan=12, two islands on
    // shifted starts; with MinSpan'd halves of 8/7 nothing reports.
    val base = toks("s", 30)
    val mut = base.updated(14, "XMUT")
    val a = base.mkString(" ")
    val b = mut.mkString(" ")
    val got = spans(write(Seq(1L -> a, 2L -> b)))
    // left half: positions 0..13 in both docs = 14 tokens; right half:
    // 15..29 = 15 tokens
    assert(got === Seq((1L, 2L, 0L, 0L, 14L), (1L, 2L, 15L, 15L, 15L)))
  }

  test("spans below MinSpan never surface") {
    val shared = toks("s", MinSpan - 1)
    val a = (toks("a", 3) ++ shared).mkString(" ")
    val b = (toks("c", 6) ++ shared).mkString(" ")
    assert(spans(write(Seq(1L -> a, 2L -> b))).isEmpty)
  }

  test("boilerplate above the df cap generates no pairs; rare spans still do") {
    val boiler = toks("bp", MinSpan + 8)
    // MaxDf+2 docs all carry the boilerplate run — its grams exceed the
    // df cap, so no quadratic pair set; two of them ALSO share a rare
    // run (behind a per-doc unique separator, so df-kept straddle
    // grams cannot weld the two regions into one island) that must
    // still be found.
    val rare = toks("r", MinSpan + 1)
    val n = MiningQueries.MaxDf.toInt + 2
    val docs = (0 until n).map { i =>
      val own = toks(s"u${i}x", 3)
      val extra = if (i < 2) rare else toks(s"v${i}x", rare.size)
      (i.toLong, (own ++ boiler ++ Seq(s"sep${i}z") ++ extra).mkString(" "))
    }
    val got = spans(write(docs))
    val start = (3 + boiler.size + 1).toLong
    assert(got === Seq((0L, 1L, start, start, (MinSpan + 1).toLong)))
  }

  test("degenerate repetition above the postings cap generates no pairs; under it, spans still surface") {
    // two docs, each one long cyclic repetition of the same SubK
    // tokens: df = 2 passes the MaxDf gate, but every gram rotation
    // appears ~R times PER DOC — the posting-list blow-up the
    // MaxPostings cap exists to stop (C(2R, 2) pairs per hash).
    def spam(rep: Int) = Seq.fill(rep)(toks("z", SubK)).flatten.mkString(" ")
    val over = (MiningQueries.MaxPostings / 2 + SubK + 2).toInt
    val capped = spans(write(Seq(1L -> spam(over), 2L -> spam(over))))
    assert(capped.isEmpty,
      s"grams past MaxPostings must be dropped as stop-grams: $capped")
    // the same shape under the cap still reports shared spans
    val under = (MiningQueries.MaxPostings / 4).toInt
    assert(spans(write(Seq(1L -> spam(under), 2L -> spam(under)))).nonEmpty)
  }

  test("identical docs report one full-length span") {
    val t = toks("w", 40).mkString(" ")
    val got = spans(write(Seq(7L -> t, 9L -> t)))
    assert(got === Seq((7L, 9L, 0L, 0L, 40L)))
  }
}
