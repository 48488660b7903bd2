package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The production injection path: a session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` must resolve
  * every native function and plan the custom top-k operator WITHOUT
  * any session-local register() call — this is how a real cluster
  * deploys the library (one conf line, every session equipped).
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    // reuse the shared context but force a NEW session with the
    // extensions applied at instantiation. `withExtensions` drives the
    // same SparkSessionExtensions entry point as the
    // `spark.sql.extensions=graft.plans.GraftExtensions` conf — the
    // conf variant is STATIC (read from the SparkContext at JVM
    // startup), so it cannot be exercised in a shared-context suite.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("injected session resolves every native function unregistered") {
    withExtensionSession { s =>
      import s.implicits._
      val row = Seq((Seq(1f, 2f), Seq(3f, 4f), Seq("a", "b", "a ng"), 0L))
        .toDF("x", "y", "w", "id")
        .select(
          expr(s"${FloatVectorDot.Name}(x, y)").as("dot"),
          expr(s"${MinHashSig.Name}(w, 8)").as("sig"),
          expr(s"${SimHash64.Name}(w)").as("sh"),
          expr(s"${NGramShingles.Name}(w, 2)").as("ng"))
        .collect()(0)
      assert(row.getDouble(0) == 11.0) // 1*3 + 2*4
      assert(row.getSeq[Long](1).nonEmpty)
      assert(!row.isNullAt(2))
      assert(row.getSeq[String](3).nonEmpty)
    }
  }

  test("injected session plans TopKPerKey without an explicit register") {
    withExtensionSession { s =>
      import s.implicits._
      val df = Seq(("a", 1L, 2.0), ("a", 2L, 5.0), ("b", 3L, 1.0))
        .toDF("key", "id", "v")
      // strategy arrives via injectPlannerStrategy, not register():
      // strip the experimental fallback the API also installs BEFORE
      // planning, so only the injected path can plan the node
      val out = TopKPerKey(df, Seq("key"), Seq(col("v").desc), 1)
      s.experimental.extraStrategies = Nil
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"strategy missing in: $plan")
      assert(out.select("key", "id").as[(String, Long)].collect().toSet ==
        Set(("a", 2L), ("b", 3L)))
    }
  }
}
