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
        stateRows = p.flatMap(_.stateOperators.headOption)
          .map(_.numRowsTotal).getOrElse(0L))
    }.toDF()
  }
}
