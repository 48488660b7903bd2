package graft.streaming

import graft.SparkSpec
import TrailingDistinctStream.{Delta, Obs}

/** TrailingDistinctStream ≡ the batch trailing-distinct semantics: the
  * stream's summed ±1 deltas, prefix-summed over the day spine, must
  * equal the brute-force sliding COUNT(DISTINCT) — a DIFFERENT
  * algorithm than both the stream (incremental segments) and the
  * batch query (one-shot segments), so agreement pins the semantics,
  * not the implementation — and must be invariant to where the
  * micro-batch boundaries fall.
  */
class TrailingDistinctStreamSpec extends SparkSpec {
  private val W = 7L
  private implicit val obsEnc: org.apache.spark.sql.Encoder[Obs] =
    org.apache.spark.sql.Encoders.product[Obs]
  private implicit val deltaEnc: org.apache.spark.sql.Encoder[Delta] =
    org.apache.spark.sql.Encoders.product[Delta]

  /** brute force: users with an activity day in [day−W+1, day]. */
  private def expected(obs: Seq[Obs]): Map[Long, Long] =
    TrailingDistinctTestAlgebra.bruteSliding(
      obs.map(o => (o.user_id, o.day)), W)

  /** prefix-sum the emitted deltas over the observed day span. */
  private def fromDeltas(ds: Seq[Delta], obs: Seq[Obs]): Map[Long, Long] =
    TrailingDistinctTestAlgebra.prefixDeltas(
      ds.map(d => (d.day, d.delta)), obs.map(o => (o.user_id, o.day)))

  // multi-user fixture exercising every state transition: singleton
  // days, in-reach extension (gap ≤ W), exact-boundary gap (= W,
  // still one segment), and a break (> W, two segments)
  private val obs = Seq(
    Obs(1L, 100L), Obs(1L, 103L), Obs(1L, 110L), Obs(1L, 120L),
    Obs(2L, 100L), Obs(2L, 107L), // gap exactly W — merges
    Obs(3L, 105L), Obs(3L, 113L), // gap W+1 — breaks
    Obs(4L, 118L))

  private def run(batches: Seq[Seq[Obs]]): Seq[Delta] =
    runRocksDbStream(batches)(ds =>
      TrailingDistinctStream.deltas(ds, W))

  test("deltas reproduce the brute-force sliding distinct count") {
    val got = fromDeltas(run(Seq(obs)), obs)
    assert(got == expected(obs))
  }

  test("result is invariant to micro-batch boundaries") {
    val want = expected(obs)
    // split mid-segment, per-day, and pathological one-row batches;
    // every split must land on the same day table
    val splits = Seq(
      obs.sortBy(_.day).grouped(3).toSeq,
      obs.sortBy(_.day).grouped(1).toSeq,
      Seq(obs.sortBy(_.day).take(4), obs.sortBy(_.day).drop(4)))
    for (batches <- splits)
      assert(fromDeltas(run(batches), obs) == want,
        s"split into ${batches.size} batches diverged")
  }

  test("duplicate and late rows are absorbed, not double-counted") {
    val withDups = Seq(
      Seq(Obs(1L, 100L), Obs(1L, 100L), Obs(2L, 101L)),
      Seq(Obs(1L, 95L), // late: before the user's last seen day
        Obs(1L, 104L), Obs(2L, 101L)))
    val clean = Seq(Obs(1L, 100L), Obs(2L, 101L), Obs(1L, 104L))
    assert(fromDeltas(run(withDups), clean) == expected(clean))
  }

  test("stream ≡ the real batch query's algorithm on sf0.001 activity") {
    // the (user, day) table the batch query derives from events —
    // capped to a user slice to keep the MemoryStream feed bounded
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val ud = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400L).cast("long").as("day"))
      .filter(col("user_id") % 50L === 0L)
      .distinct().collect()
      .map(r => Obs(r.getLong(0), r.getLong(1))).toSeq
    assert(ud.nonEmpty)
    val batches = ud.sortBy(_.day).grouped(math.max(1, ud.size / 3)).toSeq
    assert(fromDeltas(run(batches), ud) == expected(ud))
  }
}
