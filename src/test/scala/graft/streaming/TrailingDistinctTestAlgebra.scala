package graft.streaming

/** The ONE place the trailing-distinct window convention lives on the
  * test side: a user is active on day d iff they have an activity day
  * in (d−W, d] — half-open below, closed above. All three
  * TrailingDistinct specs (property, stream-harness, recovery) pin
  * the operator against these two reference algorithms; keeping them
  * here means a change to the boundary convention is applied once,
  * not silently forked across specs pinning different semantics.
  */
object TrailingDistinctTestAlgebra {

  /** Brute-force sliding COUNT(DISTINCT user) for every day in the
    * observed min..max span. A deliberately different algorithm than
    * both the stream (incremental segments) and the batch query
    * (one-shot segments), so agreement pins semantics, not
    * implementation. */
  def bruteSliding(obs: Seq[(Long, Long)], w: Long): Map[Long, Long] = {
    val days = obs.map(_._2)
    (days.min to days.max).map { d =>
      d -> obs.filter { case (_, a) => a > d - w && a <= d }
        .map(_._1).distinct.size.toLong
    }.toMap
  }

  /** Prefix-sum emitted (day, ±1) deltas over the observed day span —
    * the consumer-side reconstruction of the sliding count. */
  def prefixDeltas(deltas: Seq[(Long, Long)],
      obs: Seq[(Long, Long)]): Map[Long, Long] = {
    val byDay = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = obs.map(_._2)
    var run = 0L
    (days.min to days.max).map { d =>
      run += byDay.getOrElse(d, 0L); d -> run
    }.toMap
  }
}
