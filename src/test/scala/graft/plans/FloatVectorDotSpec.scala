package graft.plans

import graft.SparkSpec
import graft.llm.Vectors
import org.apache.spark.sql.functions._

/** The native codegen'd dot product must be bit-identical to the
  * higher-order-function fold it replaces (and therefore to the DuckDB
  * oracle twin) — on real embeddings, not toy values.
  */
class FloatVectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("dotNative == HOF dot bit-exactly on real embeddings") {
    FloatVectorDot.register(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = e.select(
      Vectors.dot(col("embedding"), col("embedding")).as("hof"),
      Vectors.dotNative(col("embedding"), col("embedding")).as("native"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (h, n) =>
      assert(java.lang.Double.doubleToLongBits(h) ==
        java.lang.Double.doubleToLongBits(n), s"hof=$h native=$n")
    }
  }

  test("null array yields null, mismatched lengths use the shorter") {
    FloatVectorDot.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f, 99.0f))),
      (None, Some(Seq(1.0f)))
    ).toDF("a", "b")
    val out = df.select(Vectors.dotNative(col("a"), col("b")).as("d"))
      .collect()
    assert(out(0).getDouble(0) == 1.0 * 3.0 + 2.0 * 4.0)
    assert(out(1).isNullAt(0))
  }

  test("wrong argument types fail analysis with a clear message") {
    FloatVectorDot.register(spark)
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(Vectors.dotNative(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
