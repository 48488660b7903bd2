package graft.llm

import graft.SparkSpec
import BpeQueries._

/** Pins the BPE trainer against the hand-derivable merge sequence of
  * the classic planted corpus, the encoder against hand-applied
  * merges, and the corpus queries' invariants at sf0.001.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // classic BPE teaching corpus: low x5, lower x2, newest x6, widest x3
  private lazy val types = Seq(
    WordSeq("low", 5L, initSymsOf("low")),
    WordSeq("lower", 2L, initSymsOf("lower")),
    WordSeq("newest", 6L, initSymsOf("newest")),
    WordSeq("widest", 3L, initSymsOf("widest"))).toDS()

  private def initSymsOf(w: String): Seq[String] =
    w.map(_.toString) :+ Eow

  test("mergeOnce: greedy left-to-right, overlaps consumed once") {
    assert(mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergeOnce(Seq("l", "o", "w"), "l", "o") == Seq("lo", "w"))
    assert(mergeOnce(Seq("x"), "a", "b") == Seq("x"))
    assert(mergeOnce(Seq.empty, "a", "b") == Seq.empty)
  }

  test("trainMerges learns the hand-derived sequence on the classic corpus") {
    val merges = trainMerges(types, budget = 5)
    val got = merges.map(m => (m.rank, m.left, m.right, m.pair_n))
    // (e,s) 9 wins the 3-way count tie lexicographically; then the
    // chain collapses "est</w>" before "low" assembles
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", Eow, 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)), s"got $got")
  }

  test("local trainer is bit-identical to the distributed round loop") {
    // classic corpus
    val localClassic = trainMergesLocal(Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 5)
    assert(localClassic == trainMerges(types, 5))
    // seeded random corpora: same words, same freqs, both paths
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val ws = (0 until 40).map(i =>
        (Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(5)).toChar).mkString,
          1L + rnd.nextInt(9))).distinctBy(_._1)
      val dist = trainMerges(
        ws.map { case (w, f) => WordSeq(w, f, initSymsOf(w)) }.toDS(), 12)
      assert(trainMergesLocal(ws, 12) == dist, s"seed $seed")
    }
  }

  test("local tie-break collation is UTF-8 byte order, matching Spark") {
    val emoji = "😀" // U+1F600, UTF-8 f0 9f 98 80
    val high = "￮"        // U+FFEE,  UTF-8 ef bf ae
    assert(emoji.compareTo(high) < 0,
      "Java's UTF-16 compareTo sorts the supplementary char first")
    assert(utf8Lt(high, emoji),
      "UTF-8 byte order sorts it last — the Spark order the trainer uses")
    assert(!utf8Lt(emoji, high) && !utf8Lt("a", "a") && utf8Lt("a", "ab"))
  }

  test("training stops early when no pair repeats") {
    val singles = Seq(WordSeq("ab", 1L, initSymsOf("ab"))).toDS()
    assert(trainMerges(singles, budget = 10).isEmpty)
  }

  test("encodeWord applies merges in rank order (unseen word generalizes)") {
    val merges = trainMerges(types, budget = 5).map(m => (m.left, m.right))
    assert(encodeWord("lowest", merges) == Seq("low", "est" + Eow))
    assert(encodeWord("low", merges) == Seq("low", Eow))
    assert(encodeWord("slowest", merges) == Seq("s", "low", "est" + Eow))
    // tokens concatenate back to the original word + marker
    for (w <- Seq("lowest", "newest", "widest", "zzz"))
      assert(encodeWord(w, merges).mkString == w + Eow)
  }

  test("corpus queries: deterministic vocab, encode round-trips counts") {
    val sf = "/root/testdata/sf0.001"
    val vocab = BpeQueries.queries("text_bpe_vocab")(spark, sf).collect()
    assert(vocab.nonEmpty && vocab.length <= MergeBudget)
    // ranks are 1..n dense, counts never increase faster than rank 1's
    assert(vocab.map(_.getLong(0)).toSeq == (1L to vocab.length).toSeq)
    assert(vocab.forall(r => r.getString(3) ==
      r.getString(1) + r.getString(2)))
    val enc = BpeQueries.queries("text_bpe_encode")(spark, sf).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (nw, nt) = (r.getLong(1), r.getLong(2))
      assert(nt >= nw, "every word yields at least one token")
      assert(r.getString(3).length == 32, "md5 hex digest")
    }
    // determinism: a second run produces the identical merge table
    val vocab2 = BpeQueries.queries("text_bpe_vocab")(spark, sf).collect()
    assert(vocab.map(_.toSeq).toSeq == vocab2.map(_.toSeq).toSeq)
  }

  test("encoding is lossless under ANY merge table: tokens rebuild the word") {
    // merges only concatenate adjacent symbols, so token concatenation
    // must equal the original word + end-of-word marker regardless of
    // which merges exist or apply
    val words = Seq("hello", "the", "extraordinarily", "a", "naïve",
      "日本語", "don't", "x")
    val tables = Seq(
      Seq.empty[(String, String)],
      Seq(("h", "e"), ("he", "l"), ("l", "o"), ("t", "h")),
      Seq(("a", "b"), ("q", "z")), // merges that never apply
      Seq(("e", BpeQueries.Eow), ("l", "l")))
    for (w <- words; m <- tables)
      assert(BpeQueries.encodeWord(w, m).mkString == w + BpeQueries.Eow,
        s"word '$w' with merges $m")
  }
}
