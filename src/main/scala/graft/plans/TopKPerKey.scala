package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k-per-key as a first-class operator (logical node + physical plan +
  * rewrite rule), registered through SparkSessionExtensions (see
  * graft.functions.GraftExtensions).
  *
  * The standard formulation — `row_number() over (partition by … order by …)`
  * then `filter(rank <= k)` — sorts EVERY group's full row set after the
  * shuffle and only then discards all but k rows. This operator keeps a
  * bounded heap of k rows per key instead: a partial pass prunes each map
  * partition to ≤k rows per key before the exchange (the row analogue of
  * partial aggregation), the final pass merges heaps after it. Shuffle
  * volume drops from |input| to ≤ k·keys·partitions rows and the per-group
  * sort of the window operator disappears — the difference between sorting
  * 100 TB and heap-scanning it.
  *
  * [[TopKRewrite]] recognises the window pattern in optimised plans and
  * swaps this in, so user code keeps the idiomatic window form.
  */
final case class TopKPerKeyNode(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Two-phase execution, memory-bounded in both phases.
  *
  * Partial phase (pre-shuffle): per-key bounded heaps prune each map
  * partition to ≤k rows per key. The heap map itself is capped at
  * `maxKeysInMemory` keys; rows of keys beyond the cap stream through
  * UNPRUNED (correct — the final phase recomputes the exact top-k), so a
  * high-cardinality partition degrades to pass-through instead of OOM,
  * exactly like hash aggregation falling back to sort-based.
  *
  * Final phase (post-shuffle): requires child ordering (key, order), which
  * EnsureRequirements satisfies with a spillable SortExec over the
  * already-pruned exchange output; the phase itself is a streaming group
  * scan holding ONE group counter — O(1) memory, like WindowExec's group
  * buffering but without materialising group row sets.
  */
final case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Option[Attribute], // defined on the final phase only
    maxKeysInMemory: Int,
    child: SparkPlan) extends UnaryExecNode {

  private def isFinal = rankAttr.isDefined

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    if (!isFinal) UnspecifiedDistribution :: Nil
    else if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (!isFinal) Seq(Nil)
    else Seq(partitionExprs.map(e => SortOrder(e, Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    val maxKeys = maxKeysInMemory
    if (!isFinal) child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap by sort order: head = worst of the current top-k
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      new Iterator[InternalRow] {
        private var pending: InternalRow = _
        private var flush: Iterator[InternalRow] = _
        private def fill(): Unit = {
          while (pending == null && rows.hasNext) {
            val row = rows.next()
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(heap) =>
                if (heap.size < kLocal) heap.enqueue(row.copy())
                else if (ordering.compare(row, heap.head) < 0) {
                  heap.dequeue(); heap.enqueue(row.copy())
                }
              case None =>
                if (heaps.size < maxKeys) {
                  val heap =
                    scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
                  heap.enqueue(row.copy())
                  heaps.put(key.copy(), heap)
                } else pending = row // cap reached: new key passes through unpruned
            }
          }
          if (pending == null && flush == null && !rows.hasNext)
            flush = heaps.valuesIterator.flatMap(_.iterator)
        }
        override def hasNext: Boolean = {
          fill(); pending != null || (flush != null && flush.hasNext)
        }
        override def next(): InternalRow = {
          fill()
          if (pending != null) { val r = pending; pending = null; r }
          else flush.next()
        }
      }
    } else child.execute().mapPartitions { rows =>
      // input sorted by (key, order): stream groups, emit the first k rows
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(
        childOutput.map(a => a: Expression) :+
          BoundReference(childOutput.length, IntegerType, nullable = false),
        childOutput :+ AttributeReference("rk_in", IntegerType, nullable = false)())
      var currentKey: UnsafeRow = null
      var rank = 0
      rows.flatMap { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          rank = 0
        }
        rank += 1
        if (rank <= kLocal) Iterator.single(project(joined(row, InternalRow(rank))))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange + sort via
  * EnsureRequirements) → final, mirroring how partial aggregation plans.
  */
class TopKStrategy(spark: SparkSession) extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, part, order, rank, child) =>
      val maxKeys = spark.sessionState.conf
        .getConfString("spark.graft.topk.maxKeysPerPartition", "1048576").toInt
      val partial = TopKPerKeyExec(k, part, order, None, maxKeys, planLater(child))
      TopKPerKeyExec(k, part, order, Some(rank), maxKeys, partial) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(rank <= k)` over `Window(row_number() over (...))` into
  * [[TopKPerKeyNode]]. Non-rank conjuncts stay in a residual Filter; the
  * rank attribute keeps its expr-id so downstream references resolve
  * unchanged. Disable per-session/per-query with
  * `spark.graft.topk.rewrite.enabled=false` to keep the stock window plan.
  */
class TopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.topk.rewrite.enabled", "true").toBoolean

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rank) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rank) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)) =>
          val rank = alias.toAttribute
          val conjuncts = splitConjunctivePredicates(cond)
          val (rankPreds, rest) = conjuncts.partition(c => limitOf(c, rank).isDefined)
          rankPreds.flatMap(limitOf(_, rank)).sorted.headOption match {
            case Some(kk) if kk > 0 =>
              val topk = TopKPerKeyNode(kk, w.partitionSpec, w.orderSpec, rank, w.child)
              if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
            case _ => f
          }
        case _ => f
      }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => other :: Nil
    }
}
