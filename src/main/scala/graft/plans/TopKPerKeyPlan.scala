package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Per-key top-k as a first-class operator: for every key group, the k
  * first rows under `order`, each with its 1-based rank — the semantics
  * of `row_number().over(partitionBy(keys).orderBy(order)) <= k`.
  *
  * The window form sorts EVERY row of every group (one big sort per
  * partition) and then discards all but k; at 100 TB that sort is the
  * cost. This operator keeps a bounded heap of k rows per key and never
  * sorts the full input: one hash exchange on the keys (no sort step —
  * `requiredChildOrdering` is empty), one streaming pass per partition,
  * O(keys-per-partition × k) task memory.
  *
  * Ties follow the usual row_number contract: make `order` a total
  * order (add a unique tiebreak column) for deterministic output. */
case class TopKPerKeyNode(
    child: LogicalPlan,
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute) extends UnaryNode {
  override val output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k: requires the child clustered on the
  * keys (hash exchange, NO sort); each task streams its partition once,
  * keeping per key a size-k priority queue whose head is the current
  * rank-worst row, then emits each group's survivors in rank order. */
case class TopKPerKeyExec(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val kk = k
    val ord = order
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, childOut)
      // compare(a, b) < 0 ⇔ a ranks before b; the PQ dequeues the MAX
      // under this ordering, i.e. the rank-worst survivor sits at head
      val rowOrd = RowOrdering.create(ord, childOut)
        .asInstanceOf[Ordering[InternalRow]]
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(row.copy())
            else if (rowOrd.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, childOut :+ rankAttr)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll yields rank-worst first; reverse for rank 1..k
        val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, (i + 1).toLong)
          outProj(joined(r, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Column-level entry point: `TopK.perKey(df, keys, orderBy, k)` →
  * every input column plus a 1-based `rn` rank column, at most k rows
  * per key group. Plain (non-SortOrder) columns order ascending. */
object TopK {
  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
      k: Int, rankCol: String = "rn"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keys.nonEmpty, "top-k per key requires at least one key column")
    Bridge.ensureStrategy(df.sparkSession, TopKPerKeyStrategy)
    Bridge.ensureOptimizerRule(df.sparkSession, PruneAsOfColumns)
    // Resolve the caller's sort columns by analyzing a throwaway
    // sortWithinPartitions plan — its Sort node carries fully-resolved
    // catalyst SortOrders against the child this node will wrap.
    val (order, plan) =
      df.sortWithinPartitions(orderBy: _*).queryExecution.analyzed match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
          (s.order, s.child)
        case other => throw new IllegalStateException(
          s"unexpected plan for sort resolution: ${other.nodeName}")
      }
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
    val node = TopKPerKeyNode(plan, keys.map(attr), order, k,
      AttributeReference(rankCol, LongType, nullable = false)())
    Bridge.ofRows(df.sparkSession, node)
  }
}
