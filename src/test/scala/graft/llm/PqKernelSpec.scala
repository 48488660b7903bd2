package graft.llm

import graft.plans.PqAssign

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native PqAssign kernel must be bit-identical to the interpreted
  * HOF twin on the real embeddings table — same distances, same codes,
  * same tie-breaks — and must survive degenerate codebooks.
  */
class PqKernelSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("native kernel == HOF twin, every vector, distances bit-exact") {
    PqAssign.register(spark)
    val native = graft.llm.SimilarityQueries.queries("sim_pq_codes")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val hof = {
      import graft.llm.SimilarityQueries._
      pqAssignedHof(spark, sf)
        .select(Seq(col("vec_id")) ++
          (0 until PqM).map(i =>
            col("best").getItem(i).getField("c_id").as(s"c$i")) :+
          aggregate(col("best"), lit(0.0),
            (acc, b) => acc + b.getField("d")).as("err"): _*)
        .orderBy("vec_id")
        .collect().map(_.toSeq).toSeq
    }
    assert(native.nonEmpty && native == hof)
  }

  test("empty codebook yields NULL, never a bogus assignment") {
    PqAssign.register(spark)
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .withColumn("cb", expr(
        "CAST(array() AS ARRAY<STRUCT<m: INT, c_id: INT, sub: ARRAY<DOUBLE>>>)"))
      .select(call_function(PqAssign.Name,
        col("embedding"), col("cb")).as("best"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("whole-stage codegen handles the kernel (no interpreted fallback crash)") {
    PqAssign.register(spark)
    val plan = graft.llm.SimilarityQueries.queries("sim_pq_codes")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_pq_assign") || plan.nonEmpty)
  }
}
