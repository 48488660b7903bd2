package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** Whole-operator top-k-per-key: the third extension tier (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, injected via
  * `SparkSessionExtensions`) next to the expression kernels.
  *
  * Why an operator and not a window: `row_number().over(partitionBy
  * (key).orderBy(o))` + `filter(rk <= k)` must SORT every partition in
  * full — O(n log n) per key and the whole corpus spills through the
  * sorter to keep k rows. This operator keeps a bounded heap per key —
  * O(n log k) compares, O(keys·k) memory — and, like an aggregate, runs
  * in two phases: a map-side PARTIAL pass caps every (partition, key)
  * at k rows before the exchange, so the shuffle moves at most
  * partitions·keys·k rows regardless of corpus size; the FINAL pass
  * after clustering re-heaps and emits ranks 1..k. At 100 TB the
  * shuffle is the difference between moving the corpus and moving a
  * few thousand rows.
  *
  * Correctness contract: identical to the window twin when the
  * ordering is total (ties broken by a unique column) — pinned by
  * `TopKPerKeySpec` and the `window_topk_native` DuckDB oracle.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rank: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rank
  override def producedAttributes: AttributeSet = AttributeSet(rank)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical bounded-heap top-k. `rank` None = partial (map-side, no
  * distribution requirement, emits unranked survivors), Some = final
  * (requires clustering on `keys`, emits dense ranks 1..k per key). */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rank: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rank
  override def producedAttributes: AttributeSet = AttributeSet(rank.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rank.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // The partial exec's output-row count IS the operator's scale claim
  // (rows entering the exchange ≤ partitions·keys·k) — surfaced as a
  // SQL metric so the bound is observable in the UI at 100 TB and
  // executable in ShuffleVolumeSpec, not narrative.
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLoc = k
    val keysLoc = keys
    val orderLoc = order
    val childOut = child.output
    val rankAttr = rank
    val outAttrs = output
    val numOutput = longMetric("numOutputRows")
    // Loud memory bound (the LocalTypeCap discipline): the per-key
    // heaps are bounded at k rows EACH, but the map holds one heap per
    // DISTINCT KEY seen in the partition — the operator's O(keys·k)
    // memory claim. On a low-cardinality key (the design target:
    // event types, channels, shards) that is trivially small; a
    // high-cardinality misuse (user_id at 100 TB) must die with an
    // actionable, operator-named error, not an opaque executor OOM
    // hours in. Overridable per session for genuinely bigger key
    // spaces that still fit memory.
    val maxEntries = conf.getConfString(
      TopKPerKey.MaxHeapEntriesKey, TopKPerKey.MaxHeapEntriesDefault)
      .toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLoc, childOut)
      val ord = RowOrdering.create(orderLoc, childOut)
      // max-heap on the sort order: peek() is the worst row kept, so a
      // candidate only enters (and evicts) when it beats the worst
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      var entries = 0L
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kLoc + 1, ord.reverse)
          heaps.put(key.copy(), q)
        }
        if (q.size() < kLoc) {
          entries += 1
          if (entries > maxEntries) throw new IllegalStateException(
            s"TopKPerKey: bounded-heap state exceeded $maxEntries rows " +
              s"in one partition (k=$kLoc, distinct keys so far=" +
              s"${heaps.size()}, kept rows=$entries) — the " +
              "operator is designed for low-cardinality keys; for a " +
              "high-cardinality key use the window row_number twin " +
              "(which spills) or raise " +
              s"${TopKPerKey.MaxHeapEntriesKey} if the state " +
              "genuinely fits executor memory")
          q.add(row.copy())
        }
        else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      rankAttr match {
        case None => // partial: ship survivors, order irrelevant
          heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
            .map { r => numOutput += 1; r }
        case Some(ra) =>
          val rankRow = new GenericInternalRow(1)
          val joined = new JoinedRow
          val proj = UnsafeProjection.create(outAttrs, childOut :+ ra)
          heaps.values().iterator().asScala.flatMap { q =>
            val arr = q.toArray(new Array[InternalRow](q.size()))
            java.util.Arrays.sort(arr, ord)
            arr.iterator.zipWithIndex.map { case (r, i) =>
              rankRow.setLong(0, i + 1L)
              numOutput += 1
              proj(joined(r, rankRow))
            }
          }
      }
    }, preservesPartitioning = true)
  }
}

/** Plans the logical node as partial-below-exchange, final-above —
  * the aggregate two-phase pattern applied to top-k. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rank, child) =>
      val partial = TopKPerKeyExec(keys, order, k, None, planLater(child))
      TopKPerKeyExec(keys, order, k, Some(rank), partial) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Conf key for the loud per-partition heap-state bound (rows kept
    * across ALL keys of one partition = distinct keys × k). */
  val MaxHeapEntriesKey = "graft.topk.maxHeapEntriesPerPartition"

  /** 8M kept rows ≈ low GBs of UnsafeRow copies — inside any sane
    * executor budget, far above every driver-surface use (≤ ~10 keys
    * × k ≤ 64). */
  val MaxHeapEntriesDefault = "8388608"

  /** Session-local strategy injection (the production path is
    * `spark.sql.extensions=graft.plans.GraftExtensions`). Idempotent. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        TopKPerKeyStrategy +: spark.experimental.extraStrategies

  /** Top `k` rows per `keyCols` group by `orderBy` (first = rank 1),
    * with a dense `rankName` LONG column. Make the ordering total
    * (unique tiebreak column) for deterministic output. */
  def apply(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
      k: Int, rankName: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    require(keyCols.nonEmpty,
      "keyCols must be non-empty: an empty key would plan a " +
        "ClusteredDistribution(Nil) and fail inside Spark's " +
        "EnsureRequirements with an internals-pointing error; for a " +
        "global top-k use orderBy(...).limit(k), which already " +
        "plans the distributed TakeOrderedAndProject")
    require(!df.columns.contains(rankName),
      s"rank column name '$rankName' already exists in the input " +
        s"(columns: ${df.columns.mkString(", ")}); pass a distinct rankName")
    val spark = df.sparkSession
    register(spark)
    import org.apache.spark.sql.graft.PlanBridge
    val keyExprs: Seq[Expression] = keyCols.map(c => PlanBridge.expr(spark, df(c)))
    val sortOrders = orderBy.map(c => PlanBridge.expr(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, sortOrders, k, rankAttr,
        df.queryExecution.analyzed))
  }
}
