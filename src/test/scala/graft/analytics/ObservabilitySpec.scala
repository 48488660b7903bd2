package graft.analytics

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Operational observability: `observe()` metrics ride an existing
  * action, so a 100 TB curation job reports its gate statistics
  * without a second scan — the mechanism a production pipeline uses
  * instead of counting twice. (The streaming analog is the
  * StreamingQueryListener surface used by streaming.StatusSnapshot.)
  */
class ObservabilitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("observe() reports gate metrics from the same single scan") {
    val obs = Observation("gate")
    val docs = Tables.documents(spark, sf)
      .withColumn("keep",
        graft.llm.CurationQueries.rowQualityKeep(col("text")).cast("long"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("keep")).as("n_kept"),
        sum(when(col("keep") === 0L, 1L).otherwise(0L)).as("n_dropped"))
    // the downstream action only sees survivors…
    val survivors = docs.filter(col("keep") === 1L).count()
    // …but the observation saw every row of the one scan
    val m = obs.get
    assert(m("n_rows") == 500L)
    assert(m("n_kept") == survivors)
    assert(m("n_kept").asInstanceOf[Long] + m("n_dropped").asInstanceOf[Long]
      == 500L)
  }
}
