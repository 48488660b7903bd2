package graft.streaming

import graft.SparkSpec
import TrailingDistinctStream.{advance, Delta, Obs, Seg}

/** The late-arrival contract, pinned with the VIOLATING input: a
  * genuinely NEW day arriving at or before the user's `last_day`
  * (out-of-order ingest — not a duplicate) is absorbed, diverging from
  * the batch twin by design. The documented absorb must be exact —
  * `n_late` incremented, a zero-delta marker emitted, the ±1 segment
  * algebra unchanged — and OBSERVABLE: the marker flows to
  * `Dataset.observe`, whose per-batch counter StatusSnapshot reports
  * as `lateAbsorbed`, so production monitoring can see the
  * silent-undercount mode instead of trusting the ordering assumption
  * blindly.
  */
class TrailingDistinctLateSpec extends SparkSpec {
  private val W = 7L
  private implicit val obsEnc: org.apache.spark.sql.Encoder[Obs] =
    org.apache.spark.sql.Encoders.product[Obs]
  private implicit val deltaEnc: org.apache.spark.sql.Encoder[Delta] =
    org.apache.spark.sql.Encoders.product[Delta]

  test("pure transition: out-of-order NEW day → n_late + marker, algebra unchanged") {
    // state after days 100, 104 (one open segment ending 104+W)
    val (base, st1) = advance(1L, Seg(Long.MinValue, 0L), Seq(100L, 104L), W)
    assert(st1 == Seg(104L, 0L))
    // day 95 is genuinely new (< 100, never seen) but arrives late
    val (lateOut, st2) = advance(1L, st1, Seq(95L), W)
    assert(st2 == Seg(104L, 1L), "n_late must count the absorb")
    assert(lateOut == Seq(Delta(1L, 95L, 0L)),
      "absorb must emit exactly the zero-delta marker")
    // emitted ±1 algebra identical to never having seen day 95
    val (cont, st3) = advance(1L, st2, Seq(110L), W)
    val (cleanCont, _) = advance(1L, st1, Seq(110L), W)
    assert(cont == cleanCont && st3.last_day == 110L,
      "the absorbed day must not perturb subsequent segment deltas")
    // a duplicate day is the same absorb path
    val (dupOut, st4) = advance(1L, st1, Seq(104L), W)
    assert(dupOut == Seq(Delta(1L, 104L, 0L)) && st4.n_late == 1L)
  }

  test("end-to-end: marker row lands in the sink, StatusSnapshot reports lateAbsorbed") {
    withRocksDbProvider {
      implicit val sqlCtx = spark.sqlContext
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Obs]
      val name = s"late_${graft.SparkSpec.streamCounter.incrementAndGet()}"
      val q = TrailingDistinctStream.deltas(input.toDS(), W)
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .start()
      try {
        input.addData(Seq(Obs(1L, 100L), Obs(1L, 104L), Obs(2L, 101L)))
        q.processAllAvailable()
        // batch 2 carries ONE late new day (95 < last=104) + a live one
        input.addData(Seq(Obs(1L, 95L), Obs(1L, 110L)))
        q.processAllAvailable()
        val rows = spark.table(name).as[Delta].collect().toSeq
        assert(rows.contains(Delta(1L, 95L, 0L)),
          "zero-delta marker must reach the sink")
        // summed-day algebra ≡ the clean (ordered) input's
        val clean = Seq(Obs(1L, 100L), Obs(2L, 101L), Obs(1L, 104L),
          Obs(1L, 110L))
        val want = TrailingDistinctTestAlgebra.bruteSliding(
          clean.map(o => (o.user_id, o.day)), W)
        val got = TrailingDistinctTestAlgebra.prefixDeltas(
          rows.map(d => (d.day, d.delta)), clean.map(o => (o.user_id, o.day)))
        assert(got == want, "marker must be inert in the day aggregate")
        // the snapshot column: last batch absorbed exactly one row
        val status = StatusSnapshot.streamingStatus(spark)
          .filter(org.apache.spark.sql.functions.col("name") === name)
          .collect()
        assert(status.length == 1)
        assert(status(0).getAs[Long]("lateAbsorbed") == 1L,
          s"snapshot must surface the absorb (got ${status.toSeq})")
      } finally q.stop()
    }
  }
}
