package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The ONE registration wrapper for the native kernels: every
  * companion ([[FloatVectorDot]], [[MinHashSig]], [[NGramShingles]],
  * [[SimHash64]], [[NearestCentroid]], [[NearestCentroidL2]],
  * [[PqAssign]]) keeps only its Name and builder; the temp-function
  * registration and the SparkSessionExtensions injectFunction tuple
  * are built here, so a change to how kernels register (source tag,
  * ExpressionInfo usage strings, …) is a one-file edit instead of
  * seven parallel ones where a missed site silently diverges.
  */
private[plans] object KernelRegistry {
  type Builder = Seq[Expression] => Expression

  def register(spark: SparkSession, name: String, builder: Builder): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  def description(name: String, clazz: Class[_], builder: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), builder)
}
