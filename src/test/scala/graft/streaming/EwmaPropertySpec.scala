package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import EwmaStream.{advance, Feat, Obs}

/** Property tests for the EWMA transition ([[EwmaStream.advance]] is
  * pure — the TrailingDistinctPropertySpec pattern): over seeded-random
  * observation sets and batch splits, the smoothed value is
  * bit-identical to the plain sequential fold (EWMA is order-DEPENDENT,
  * so batches feed time-ordered — the per-key in-order delivery
  * contract — while rows WITHIN a batch may arrive shuffled), replays
  * emit nothing and never move the fold, and the stale counter
  * accounts every behind-frontier row except the absorbed exact replay
  * of the last applied one. The Spark-harness spec (EwmaStreamSpec)
  * pins the operator wiring.
  */
class EwmaPropertySpec extends AnyFunSuite {

  /** handler-equivalent: sort within the batch, carry state across. */
  private def runSplit(obs: Seq[Obs],
      cuts: Seq[Int]): (Seq[Feat], Option[Feat]) = {
    val bounds = (0 +: cuts :+ obs.size).distinct.sorted
    var st: Option[Feat] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[Feat]
    for ((a, b) <- bounds.zip(bounds.tail)) {
      val batch = obs.slice(a, b).sortBy(o => (o.ts, o.event_id))
      val (emitted, st1) = advance(11L, st, batch)
      out ++= emitted
      st = st1
    }
    (out.toSeq, st)
  }

  /** the batch twin's fold over the time-sorted tape. */
  private def brute(obs: Seq[Obs]): Double = {
    val sorted = obs.sortBy(o => (o.ts, o.event_id))
    var e = 0.0
    for ((o, i) <- sorted.zipWithIndex)
      e = if (i == 0) o.v else 0.5 * o.v + 0.5 * e
    e
  }

  /** distinct (ts, event_id) coordinates, random values. */
  private def randomObs(rnd: scala.util.Random, n: Int): Seq[Obs] =
    rnd.shuffle((1 to n).map(i =>
      Obs(11L, 1000L + rnd.nextInt(15), i.toLong, rnd.nextInt(400) / 4.0)))

  test("random streams: ewma ≡ the sequential fold, bit-identical, any time-ordered split") {
    for (seed <- 1 to 300) {
      val rnd = new scala.util.Random(seed)
      val obs = randomObs(rnd, 1 + rnd.nextInt(30))
      // batches must be time-ordered ACROSS (the delivery contract):
      // cut the time-sorted tape, then shuffle within each batch
      val tape = obs.sortBy(o => (o.ts, o.event_id))
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(tape.size + 1))
      val bounds = (0 +: cuts :+ tape.size).distinct.sorted
      val shuffledWithin = bounds.zip(bounds.tail)
        .flatMap { case (a, b) => rnd.shuffle(tape.slice(a, b)) }
      val (_, st) = runSplit(shuffledWithin, cuts)
      assert(st.isDefined)
      assert(st.get.ewma_cents == brute(obs),
        s"seed=$seed fold must be bit-identical")
      assert(st.get.n_applied == obs.size.toLong)
      assert(st.get.n_stale == 0L, "in-order delivery counts no stale rows")
    }
  }

  test("replaying a prefix emits nothing, moves nothing but the stale counter") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(800 + seed)
      val obs = randomObs(rnd, 2 + rnd.nextInt(20))
      val tape = obs.sortBy(o => (o.ts, o.event_id))
      val (_, st) = runSplit(tape, Nil)
      val k = 1 + rnd.nextInt(tape.size)
      val prefix = tape.take(k)
      val (emitted, st2) = advance(11L, st, prefix)
      assert(emitted.isEmpty, s"seed=$seed replay must not emit")
      val s2 = st2.get
      assert(s2.ewma_cents == st.get.ewma_cents &&
        s2.n_applied == st.get.n_applied &&
        (s2.last_ts, s2.last_event) == (st.get.last_ts, st.get.last_event),
        s"seed=$seed replay moved the fold")
      // every replayed row counts stale EXCEPT the exact replay of the
      // last applied row (absorbed silently)
      val absorbed = if (k == tape.size) 1 else 0
      assert(s2.n_stale == st.get.n_stale + k - absorbed,
        s"seed=$seed stale accounting")
    }
  }
}
