package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to the one `private[sql]` entry point a custom whole-operator
  * API needs: wrapping a hand-built [[LogicalPlan]] back into a public
  * `DataFrame`. Lives under `org.apache.spark.sql` for package-private
  * access; contains no logic.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression, converted EAGERLY through the
    * session converter (Spark 4 hides `Column.expr` behind the
    * ColumnNode indirection; the lazy `ExpressionUtils` wrapper keeps
    * non-serializable api-layer nodes inside the tree). */
  def expr(spark: org.apache.spark.sql.SparkSession,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
