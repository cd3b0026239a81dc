package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Grouped top-k: the k extreme rows per group under a total order —
  * `SELECT * ... row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * without the window's full shuffle-and-sort.
  *
  * Spark's only built-in route materializes EVERY row through one
  * hash-partitioned exchange and then sorts whole partitions — at 100 TB
  * the exchange alone dominates, and `TakeOrderedAndProject` only covers
  * the global (ungrouped) case. This operator is the missing two-phase
  * form (SURVEY.md §2.7 W1/O5 scale path):
  *
  *   1. partial: per input partition, a bounded heap per group keeps at
  *      most k rows — shrinking the exchange payload from n rows to
  *      ≤ partitions × groups × k;
  *   2. exchange: hash by group key (inserted by `EnsureRequirements`
  *      from the final node's required distribution);
  *   3. final: the same heap pass over the ≤ shuffled candidates.
  *
  * The partial phase flushes its hash map downstream whenever it exceeds
  * `maxPartialGroups`, so driver-invisible group-cardinality explosions
  * degrade to a plain shuffle instead of an executor OOM — the same
  * contract as Spark's partial hash aggregation spill.
  *
  * Registered through the full extension stack — logical node, planner
  * `SparkStrategy`, physical `UnaryExecNode`, wired by
  * [[GraftExtensions]] via `spark.sql.extensions` — as the engine's
  * demonstration of a whole-operator Catalyst extension (the (c) tier of
  * the custom-operator ladder; the (b) tier is `functions.DotProduct`).
  *
  * Ties: like `row_number`, the winner among order-equal rows is
  * unspecified — pass a TOTAL order (include a unique key) when
  * deterministic output matters, e.g. for the `w4_grouped_topk` oracle.
  */
object GroupedTopK {

  /** Declarative entry: k smallest rows per group under `order`. */
  def topK(df: DataFrame, groupCols: Seq[String], k: Int,
           order: Column*): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(order.nonEmpty, "grouped top-k needs at least one order column")
    val groupExprs = groupCols.map(c => ColumnBridge.toExpression(df.col(c)))
    val sortOrder = order.map { c =>
      ColumnBridge.toExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    ColumnBridge.ofRows(df.sparkSession,
      GroupedTopKNode(groupExprs, sortOrder, k,
        df.queryExecution.analyzed))
  }
}

/** Logical form; output/schema are the child's, only cardinality shrinks. */
case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Two-phase physical operator; `partial = true` runs pre-shuffle. */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialGroups: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partial map flushes"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val groupLocal = groupExprs
    val orderLocal = order
    val outputLocal = output
    val kLocal = k
    val flushAt = if (partial) maxPartialGroups else Int.MaxValue
    val outRows = longMetric("numOutputRows")
    val flushes = longMetric("numFlushes")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupLocal, outputLocal)
      val ord = RowOrdering.create(orderLocal, outputLocal)
      // max-heap under `ord`: head is the worst of the kept k-smallest.
      val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)

      def newHeaps() =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var heaps = newHeaps()

      def add(row: InternalRow): Unit = {
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heap.enqueue(row.copy())
            heaps.put(key.copy().asInstanceOf[UnsafeRow], heap)
        }
      }

      // Per-group ascending emission (dequeueAll is worst-first).
      def drain(hs: mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]) =
        hs.valuesIterator.flatMap(_.dequeueAll.reverseIterator)

      new Iterator[InternalRow] {
        private var flushed: Iterator[InternalRow] = Iterator.empty
        private var done = false
        private def advance(): Unit = {
          while (!flushed.hasNext && !done) {
            if (!iter.hasNext) { flushed = drain(heaps); heaps = newHeaps(); done = true }
            else {
              add(iter.next())
              if (heaps.size > flushAt) {
                val full = heaps; heaps = newHeaps(); flushed = drain(full)
                flushes += 1
              }
            }
          }
        }
        def hasNext: Boolean = { advance(); flushed.hasNext }
        def next(): InternalRow = { advance(); outRows += 1; flushed.next() }
      }
    }, preservesPartitioning = true)
  }
}

/** Plans [[GroupedTopKNode]] as partial → (exchange) → final; the
  * exchange comes from `EnsureRequirements` satisfying the final node's
  * `ClusteredDistribution`, so AQE still owns partition counts. */
class GraftStrategies(spark: SparkSession) extends SparkStrategy {
  private def maxPartialGroups: Int =
    spark.conf.getOption("spark.graft.topk.maxPartialGroups")
      .map(_.toInt).getOrElse(1 << 17)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(g, o, k, child) =>
      val m = maxPartialGroups
      val partial = GroupedTopKExec(g, o, k, partial = true, m, planLater(child))
      GroupedTopKExec(g, o, k, partial = false, m, partial) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions` entry point (set by `GraftSession.builder`):
  * the whole-operator strategy plus SQL registration of the engine's
  * codegen expressions, so `spark.sql("… graft_dot(a, b) …")` works the
  * same as the Column API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(new GraftStrategies(_))
    e.injectOptimizerRule(_ => RowNumberTopKRewrite)
    e.injectOptimizerRule(_ => SummaryAggRewrite)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
        graft.functions.DotProduct(args.head, args(1))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polyhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.PolyHash].getName, "graft_polyhash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1,
          s"graft_polyhash takes 1 argument, got ${args.length}")
        graft.functions.PolyHash(args.head)
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_poschecksum"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.PosChecksum].getName, "graft_poschecksum"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1,
          s"graft_poschecksum takes 1 argument, got ${args.length}")
        graft.functions.PosChecksum(args.head)
      }))
  }
}
