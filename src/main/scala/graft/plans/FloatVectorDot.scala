package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-embedding dot product —
  * the one hot path where the built-in higher-order functions
  * (`aggregate`/`zip_with`, used by [[graft.llm.Vectors.dot]]) genuinely
  * can't keep up: they are CodegenFallback (interpreted, one closure
  * call and boxed lambda variable per element), while this expression
  * generates a tight primitive loop inside whole-stage codegen.
  *
  * Contract is IDENTICAL to the HOF version and the DuckDB oracle twin
  * ([[graft.llm.Vectors.dotSql]]) on EVERY input, edge cases included:
  *   - each float widened to double BEFORE the multiply, sequential
  *     left-to-right accumulation (bit-identical sums);
  *   - mismatched array lengths -> NULL (zip_with null-pads the short
  *     side, the null product poisons the fold);
  *   - any NULL element -> NULL (same poisoning);
  *   - NULL array -> NULL.
  * Swapping implementations therefore cannot change a single bit of
  * any oracle-checked result — pinned by FloatVectorDotSpec.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT> arguments, got $l and $r")
    }

  override def dataType: DataType = DoubleType
  // null also on mismatched lengths / null elements, not just null input
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  val Name = "graft_vec_dot"

  private def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, s"$Name expects 2 arguments")
    FloatVectorDot(children.head, children(1))
  }

  /** Session-local registration (no extensions conf needed): makes
    * `expr("graft_vec_dot(a, b)")` resolvable. Idempotent. */
  def register(spark: SparkSession): Unit =
    KernelRegistry.register(spark, Name, builder)

  private[plans] val functionDescription =
    KernelRegistry.description(Name, classOf[FloatVectorDot], builder)
}

/** Production injection point: `--conf
  * spark.sql.extensions=graft.plans.GraftExtensions` registers the
  * native functions in every session of the cluster.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(FloatVectorDot.functionDescription)
    ext.injectFunction(MinHashSig.functionDescription)
    ext.injectFunction(SimHash64.functionDescription)
    ext.injectFunction(NGramShingles.functionDescription)
    ext.injectFunction(NearestCentroid.functionDescription)
    ext.injectFunction(NearestCentroidL2.functionDescription)
    ext.injectFunction(PqAssign.functionDescription)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
