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
      stateRows: Long,
      lateAbsorbed: Long)   // out-of-order rows absorbed LAST batch

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
          .getOrElse(0L),
        // any Dataset.observe block reporting a `late_absorbed`
        // counter (TrailingDistinctStream.deltas attaches one) is
        // summed here — absorbed out-of-order rows are the silent-
        // undercount mode this snapshot exists to make visible; 0
        // also covers queries that report no such metric
        lateAbsorbed = p.map { pp =>
          import scala.jdk.CollectionConverters._
          pp.observedMetrics.asScala.values.collect {
            case r if r.schema.fieldNames.contains("late_absorbed") =>
              val i = r.fieldIndex("late_absorbed")
              if (r.isNullAt(i)) 0L else r.getLong(i)
          }.sum
        }.getOrElse(0L))
    }.toDF()
  }
}
