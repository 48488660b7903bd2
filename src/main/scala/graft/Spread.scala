package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Partitioning for FAN-OUT stages — C(k,2) pair explodes, wedge
  * self-joins, per-key rank windows — whose downstream volume AQE
  * cannot see: adaptive coalescing sizes post-shuffle partitions by
  * their INPUT bytes, and a frame that is small in bytes but explodes
  * combinatorially gets coalesced onto a handful of cores (measured:
  * graph_local_clustering's wedge pipeline ran 6.3 s of CPU on 1 of
  * 32 cores; coSupplyEdges' pair explode on 4). This is the
  * join-fanout blindness the round-15 skew probe documented, showing
  * up as lost parallelism instead of a straggler.
  *
  * The partition count is the session conf `graft.fanoutPartitions`,
  * defaulting to `defaultParallelism` (= total cores): right for the
  * driver bench and for any cluster where the fan-out INPUT (edge
  * lists, basket frames — data-proxy-sized, far below the corpus) fits
  * cores × a healthy partition size. A deployment whose proxy frames
  * outgrow that sets the conf from data volume (bytes / ~128 MB), the
  * same per-session knob discipline as `spark.sql.shuffle.partitions`;
  * the spread is one cheap linear exchange of the proxy frame either
  * way, never of the payload.
  */
object Spread {
  private def n(df: DataFrame): Int = {
    val s = df.sparkSession
    s.conf.getOption("graft.fanoutPartitions").map(_.toInt)
      .getOrElse(s.sparkContext.defaultParallelism)
  }

  /** Round-robin spread before a map-side explode / broadcast-probe
    * fan-out (no downstream keying to preserve). */
  def fanout(df: DataFrame): DataFrame = df.repartition(n(df))

  /** Hash spread on the keys a downstream groupBy/window/self-join
    * clusters on: the explicit exchange SATISFIES that operator's
    * distribution, so the plan keeps exactly one exchange — it just
    * stops byte-sized coalescing from serializing the heavy post-
    * shuffle work. */
  def fanoutBy(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(n(df), cols: _*)
}
