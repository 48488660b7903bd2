package graft.streaming

import graft.SparkSpec
import DedupStream._

/** The streaming dedup gate must keep exactly one canonical doc per
  * distinct content across batches, give duplicates their canonical
  * pointer, and stay idempotent under at-least-once replay.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, String)]]): Seq[Decision] =
    runRocksDbStream(batches)(DedupStream.dedup)

  test("first batch: one keeper per content, smallest doc_id canonical") {
    val out = run(Seq(Seq(
      (2L, "alpha text"), (1L, "alpha text"), (3L, "beta text"))))
    val byDoc = out.map(d => d.doc_id -> d).toMap
    assert(byDoc(1L).kept && byDoc(1L).canonical == 1L)
    assert(!byDoc(2L).kept && byDoc(2L).canonical == 1L)
    assert(byDoc(3L).kept && byDoc(3L).canonical == 3L)
  }

  test("later batches defer to the established canonical; replay is idempotent") {
    val b1 = Seq((1L, "alpha"), (3L, "beta"))
    val b2 = Seq((4L, "alpha"), (1L, "alpha"), (5L, "gamma"))
    val out = run(Seq(b1, b2))
    val later = out.drop(2).map(d => d.doc_id -> d).toMap
    assert(!later(4L).kept && later(4L).canonical == 1L,
      "cross-batch duplicate must be dropped")
    assert(later(1L).kept && later(1L).canonical == 1L,
      "replayed canonical doc must keep its decision (idempotent)")
    assert(later(5L).kept && later(5L).canonical == 5L)
  }

  test("normalization matches the batch twin: casefold + whitespace-collapse") {
    val out = run(Seq(Seq(
      (1L, "Some Text"), (2L, "some text"),
      (3L, "  some \t\t text "), (4L, "sometext"))))
    val byDoc = out.map(d => d.doc_id -> d).toMap
    assert(byDoc(1L).kept && !byDoc(2L).kept && byDoc(2L).canonical == 1L)
    assert(!byDoc(3L).kept && byDoc(3L).canonical == 1L,
      "re-wrapped whitespace must collapse like dedup_normalized_groups")
    assert(byDoc(1L).digest == byDoc(2L).digest &&
      byDoc(2L).digest == byDoc(3L).digest)
    assert(byDoc(4L).kept, "joined words are a different document")
  }
}
