package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization assignment: given a FLOAT embedding and
  * a broadcast codebook `ARRAY<STRUCT<m INT, c_id INT, sub
  * ARRAY<DOUBLE>>>`, returns per subspace m the struct `(d DOUBLE,
  * c_id INT)` of the nearest centroid — squared L2 over the m-th
  * subvector slice, ties to the SMALLEST c_id.
  *
  * One compiled pass over the whole codebook per row; the HOF twin
  * (`transform(sequence(...), m -> array_min(transform(filter(cb, ...`
  * in SimilarityQueries) pays an interpreted closure per centroid per
  * subspace and re-scans the codebook PqM times. Bit-identical to the
  * twin (pinned in PqSpec/PqKernelSpec): float widened to double
  * before the subtract, sequential j-fold, and the comparison is the
  * exact lexicographic struct(d, c_id) ordering — NaN compares like
  * Spark doubles (larger than everything, equal to itself), so even
  * degenerate inputs agree. Empty codebook → NULL.
  */
case class PqAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType, _, _),
              StructField(_, IntegerType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, " +
          s"ARRAY<STRUCT<INT, INT, ARRAY<DOUBLE>>>), got ($a, $b)")
    }

  override def dataType: DataType = PqAssign.OutType
  override def nullable: Boolean = true
  override def prettyName: String = PqAssign.Name

  /** Null for every no-answer case, never undefined bytes: an empty
    * codebook, a NULL slot in the embedding or a NULL codebook entry
    * (UnsafeArrayData.getFloat on a null slot reads garbage silently),
    * a negative subspace id, or an embedding shorter than the
    * m*dsub+dsub slice a codebook entry addresses (an out-of-range
    * getFloat also returns undefined bytes rather than throwing).
    * Same contract as the sibling kernel NearestCentroidL2. */
  def computeBest(embAny: Any, cbAny: Any): ArrayData = {
    val emb = embAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val n = cb.numElements()
    if (n == 0) return null
    val embLen = emb.numElements()
    var j0 = 0
    while (j0 < embLen) {
      if (emb.isNullAt(j0)) return null
      j0 += 1
    }
    var maxM = 0
    var i = 0
    while (i < n) {
      if (cb.isNullAt(i)) return null
      val m = cb.getStruct(i, 3).getInt(0)
      if (m < 0) return null
      if (m > maxM) maxM = m
      i += 1
    }
    val bestD = new Array[Double](maxM + 1)
    val bestId = new Array[Int](maxM + 1)
    val found = new Array[Boolean](maxM + 1)
    i = 0
    while (i < n) {
      val c = cb.getStruct(i, 3)
      val m = c.getInt(0)
      val cid = c.getInt(1)
      val sub = c.getArray(2)
      val dsub = sub.numElements()
      val off = m * dsub
      if (off + dsub > embLen) return null
      var acc = 0.0
      var j = 0
      while (j < dsub) {
        if (sub.isNullAt(j)) return null
        val t = emb.getFloat(off + j).toDouble - sub.getDouble(j)
        acc += t * t
        j += 1
      }
      // exact lexicographic struct(d, c_id) ordering, NaN-consistent
      // with Spark's double ordering via Double.compare
      val cmp = java.lang.Double.compare(acc, bestD(m))
      if (!found(m) || cmp < 0 || (cmp == 0 && cid < bestId(m))) {
        bestD(m) = acc
        bestId(m) = cid
        found(m) = true
      }
      i += 1
    }
    val rows = new Array[Any](maxM + 1)
    i = 0
    while (i <= maxM) {
      val r = new GenericInternalRow(2)
      if (found(i)) {
        r.update(0, bestD(i))
        r.update(1, bestId(i))
        rows(i) = r
      } else rows(i) = null // a subspace with no centroids
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(emb: Any, cb: Any): Any =
    computeBest(emb, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAssign", this, classOf[PqAssign].getName)
    nullSafeCodeGen(ctx, ev, (e, c) =>
      s"""${ev.value} = $self.computeBest($e, $c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssign =
    copy(left = newLeft, right = newRight)
}

object PqAssign {
  val Name = "graft_pq_assign"

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c_id", IntegerType, nullable = false))),
    containsNull = true)

  private def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, s"$Name expects (embedding, codebook)")
    PqAssign(children(0), children(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, builder, "built-in")

  private[plans] val functionDescription =
    (new FunctionIdentifier(Name),
      new ExpressionInfo(classOf[PqAssign].getName, Name),
      (children: Seq[Expression]) => builder(children))
}
