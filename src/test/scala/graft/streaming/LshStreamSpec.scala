package graft.streaming

import graft.SparkSpec
import LshStream._

/** The streaming LSH gate must flag any doc sharing a band bucket
  * with an earlier doc (OR over bands), point candidates at the
  * bucket's first-seen canonical across batches, stay idempotent
  * under replay of the canonical row, and stop emitting once a bucket
  * passes the hot cap while still counting occupancy.
  */
class LshStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Int, Long)]]): Seq[BandHit] =
    runRocksDbStream(batches)(LshStream.gate)

  test("bucket-mates flag against the first-seen doc; distinct buckets stay silent") {
    val out = run(Seq(Seq(
      (1L, 0, 7L), (2L, 0, 7L),   // same bucket -> 2 flags vs 1
      (3L, 0, 9L),                 // alone in its bucket
      (2L, 1, 4L), (4L, 1, 4L)))) // second band: 4 flags vs 2
    assert(out.toSet == Set(
      BandHit(2L, 0, 7L, 1L), BandHit(4L, 1, 4L, 2L)))
  }

  test("canonical persists across batches; replayed canonical emits nothing") {
    val out = run(Seq(
      Seq((5L, 2, 11L)),
      Seq((6L, 2, 11L), (5L, 2, 11L), (7L, 2, 11L))))
    assert(out.toSet == Set(
      BandHit(6L, 2, 11L, 5L), BandHit(7L, 2, 11L, 5L)))
  }

  test("within-batch arrival order cannot change the canonical") {
    val out = run(Seq(Seq((9L, 3, 1L), (8L, 3, 1L))))
    assert(out.toSet == Set(BandHit(9L, 3, 1L, 8L)))
  }

  test("hot bucket stops emitting past MaxBucket occupancy") {
    val docs = (1L to MaxBucket + 5L).map(i => (i, 4, 99L))
    val out = run(Seq(docs))
    // occupancy counts the canonical too: arrivals flag while the
    // bucket holds <= MaxBucket docs, i.e. docs 2..MaxBucket
    assert(out.size == MaxBucket - 1)
    assert(out.forall(_.candidate_of == 1L))
    assert(!out.exists(_.doc_id > MaxBucket))
  }

  test("occupancy counts DISTINCT docs: member replays cannot eat the cap") {
    // fill to one below the cap, then redeliver every member five
    // times; a genuinely new doc must STILL flag (an arrival counter
    // would have pushed 'occupancy' past MaxBucket and suppressed it)
    val fill = (1L to MaxBucket - 1L).map(i => (i, 5, 77L))
    val replays = (1L to 5L).flatMap(_ =>
      (2L to MaxBucket - 1L).map(i => (i, 5, 77L)))
    val out = run(Seq(fill, replays, Seq((900L, 5, 77L), (901L, 5, 77L))))
    // replays emit nothing (absorbed), 900 takes the last slot, 901
    // is past the cap
    assert(out.count(_.doc_id == 900L) == 1)
    assert(!out.exists(_.doc_id == 901L))
    assert(out.size == (MaxBucket - 2) + 1) // fill members + doc 900
  }
}
