package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O28 `/_status` for the streaming side (`lib/QutyCluster.js:641-658`:
  * `{ready, nodes, channels}`; HTTP routing `lib/Server.js:230-286`):
  * one row per active streaming query built from `lastProgress` — batch
  * id, input rows, state-store rows — the operational snapshot a
  * deployment polls. The membership-count twin is the oracle-checked
  * `status_snapshot` batch query (analytics/RoutingQueries).
  *
  * Driver-side by design: the row count is the number of active
  * queries (operational metadata), never data-scale.
  */
object StatusSnapshot {

  case class StreamStatus(
      name: String,
      ready: Boolean,       // made progress at least once
      batchId: Long,
      numInputRows: Long,
      stateRows: Long)

  def streamingStatus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active.toSeq.map { q =>
      val p = Option(q.lastProgress)
      StreamStatus(
        name = Option(q.name).getOrElse(q.id.toString),
        ready = p.isDefined,
        batchId = p.map(_.batchId).getOrElse(-1L),
        numInputRows = p.map(_.numInputRows).getOrElse(0L),
        // SUM over all stateful operators: a query chaining e.g.
        // dropDuplicatesWithinWatermark into a transformWithState has
        // several, and reporting only the first would understate the
        // state size this snapshot exists to monitor
        stateRows = p.map(_.stateOperators.map(_.numRowsTotal).sum)
          .getOrElse(0L))
    }.toDF()
  }
}
