package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
    rankAttr: Attribute,
    maxKeysPerPartition: Long = TopK.DefaultMaxKeysPerPartition)
  extends UnaryNode {
  override val output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, planLater(n.child),
        n.maxKeysPerPartition) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k: requires the child clustered on the
  * keys (hash exchange, NO sort); each task streams its partition once,
  * keeping per key a size-k priority queue whose head is the current
  * rank-worst row, then emits each group's survivors in rank order.
  *
  * Task memory is O(distinct-keys-per-partition × k × row size) in
  * plain JVM heap — deliberately outside Spark's task memory manager
  * (the win over the window form is exactly "no sort, no spill
  * machinery"). That bound is enforced, not hoped for:
  * `maxKeysPerPartition` (default [[TopK.DefaultMaxKeysPerPartition]],
  * configurable via `spark.graft.topk.maxKeysPerPartition`) caps the
  * heap map instead of letting a high-cardinality key column OOM the
  * executor. What happens AT the cap is `spark.graft.topk.onOverflow`:
  *  - `sort` (default): the task degrades to a spill-capable external
  *    sort of the surviving heap rows plus the unread remainder,
  *    ordered (keys, order), then streams rank ≤ k per group — exactly
  *    the strategy (and memory profile) of the window row_number form
  *    this operator replaces, so a plan that would have succeeded as a
  *    window still succeeds here. Heap evictions before the overflow
  *    are safe to drop: an evicted row was already beaten by k rows of
  *    its own key, so no later input can put it back in the top-k.
  *  - `fail`: the task fails with a sizing-and-remediation message —
  *    for pipelines that would rather size explicitly than silently
  *    pay for a sort at scale.
  * Sizing rule (PERF.md "Known deliberate bounds"): keys/partition ≈
  * distinct keys ÷ shuffle partitions; keep keys × k × avg row bytes
  * well under the executor's per-task heap share. */
case class TopKPerKeyExec(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan,
    maxKeysPerPartition: Long = TopK.DefaultMaxKeysPerPartition)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rankAttr is minted by this node — without this override missingInput
  // is non-empty and explain() renders the operator with the '!'
  // invalid-plan marker (same override as the logical node)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  // ops visibility at scale: heap-key totals size the
  // maxKeysPerPartition knob from a real run, and a non-zero fallback
  // count says the sort degrade (not the heap) served the query
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = {
    import org.apache.spark.sql.execution.metric.SQLMetrics
    Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
      "numHeapKeys" -> SQLMetrics.createMetric(sparkContext, "distinct keys held in heaps (all tasks)"),
      "sortFallbackTasks" -> SQLMetrics.createMetric(sparkContext, "tasks degraded to spilling sort"))
  }

  protected override def doExecute(): RDD[InternalRow] = {
    // locals only inside the task closure: a field reference would drag
    // `this` (the whole plan subtree) into every task binary
    val childOut = child.output
    val kk = k
    val ord = order
    val maxKeys = maxKeysPerPartition
    val keyExprs = keys
    val outAttrs = output
    val rank = rankAttr
    // the Column entry point mints a LongType rank; the window-rewrite
    // path reuses row_number()'s IntegerType attribute — write whichever
    // the output schema declares
    val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
    val failOnOverflow = conf.getConfString(
      "spark.graft.topk.onOverflow", "sort") match {
      case "fail" => true
      case "sort" => false
      case other => throw new IllegalArgumentException(
        s"spark.graft.topk.onOverflow must be 'sort' or 'fail', got '$other'")
    }
    val numOutputRows = longMetric("numOutputRows")
    val numHeapKeys = longMetric("numHeapKeys")
    val sortFallbackTasks = longMetric("sortFallbackTasks")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOut)
      // compare(a, b) < 0 ⇔ a ranks before b; the PQ dequeues the MAX
      // under this ordering, i.e. the rank-worst survivor sits at head
      val rowOrd = RowOrdering.create(ord, childOut)
        .asInstanceOf[Ordering[InternalRow]]
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      // heap phase: stream rows until done or the key cap is hit; the
      // row that would create heap maxKeys+1 is handed to the sort phase
      var overflowRow: InternalRow = null
      while (iter.hasNext && overflowRow == null) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(row.copy())
            else if (rowOrd.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            if (heaps.size >= maxKeys) {
              if (failOnOverflow) throw new IllegalStateException(
                s"TopKPerKeyExec exceeded $maxKeys distinct keys in one " +
                  "partition (task memory is O(keys × k) on plain JVM heap). " +
                  "Raise spark.sql.shuffle.partitions so fewer keys land per " +
                  "task, raise spark.graft.topk.maxKeysPerPartition if the " +
                  "heap fits, or set spark.graft.topk.onOverflow=sort to " +
                  "degrade to a spilling sort (the window form's strategy).")
              overflowRow = row.copy()
            } else {
              val heap = mutable.PriorityQueue.empty[InternalRow](rowOrd)
              heap.enqueue(row.copy())
              heaps.put(key.copy(), heap)
            }
        }
      }
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, childOut :+ rank)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      numHeapKeys += heaps.size
      if (overflowRow == null) {
        heaps.iterator.flatMap { case (_, heap) =>
          // dequeueAll yields rank-worst first; reverse for rank 1..k
          val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
          ranked.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, if (rankIsInt) i + 1 else (i + 1).toLong)
            numOutputRows += 1
            outProj(joined(r, rankRow))
          }
        }
      } else {
        sortFallbackTasks += 1
        // sort-degrade phase: exactly the window row_number strategy —
        // external sort by (keys, order) with spill via Spark's task
        // memory manager, then one streaming rank pass. Rows already
        // evicted from a heap were beaten by k same-key rows, so only
        // the heap SURVIVORS plus the unread remainder need sorting.
        val keySort = keyExprs.map(SortOrder(_, Ascending))
        val fullOrd = RowOrdering.create(keySort ++ ord, childOut)
          .asInstanceOf[Ordering[InternalRow]]
        // constant prefix: the row comparator does the whole compare —
        // this path is the escape hatch, not the hot path, and a
        // constant prefix keeps it type-agnostic
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.value = 0L; p.isNull = false; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(childOut),
          fullOrd, PrefixComparators.LONG, prefixComputer,
          Bridge.pageSizeBytes, false)
        val toUnsafe = UnsafeProjection.create(childOut, childOut)
        heaps.foreach { case (_, heap) =>
          heap.dequeueAll.foreach((r: InternalRow) => sorter.insertRow(toUnsafe(r)))
        }
        heaps.clear()
        sorter.insertRow(toUnsafe(overflowRow))
        iter.foreach(r => sorter.insertRow(toUnsafe(r)))
        val sorted = sorter.sort()
        // streaming rank over key-adjacent sorted rows
        var curKey: UnsafeRow = null
        var rankNo = 0L
        sorted.flatMap { r =>
          val key = keyProj(r)
          if (curKey == null || key != curKey) { curKey = key.copy(); rankNo = 0L }
          rankNo += 1
          if (rankNo <= kk) {
            rankRow.update(0, if (rankIsInt) rankNo.toInt else rankNo)
            numOutputRows += 1
            Iterator.single(outProj(joined(r, rankRow)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rule rewriting the universal top-k-per-group idiom
  *
  *   `filter(row_number().over(partitionBy(keys).orderBy(o)) <= k)`
  *
  * into [[TopKPerKeyNode]]: users keep writing the window form and the
  * engine plans the bounded-heap operator — no per-partition sort of
  * the full input, which is the whole cost of the window form at scale.
  * (Spark's own `InferWindowGroupLimit` only PREFILTERS each partition
  * to its top-k before the sort; the sort itself remains. This rule
  * removes the Window — and therefore the sort — entirely.)
  *
  * Fires only when the rewrite is provably equivalent:
  *  - the Window computes exactly ONE expression, a `row_number()` with
  *    the standard (UnboundedPreceding, CurrentRow) row frame — rank()/
  *    dense_rank() have tie semantics a k-bounded heap cannot honor
  *    (the boundary group must survive in full);
  *  - partition keys are plain attributes containing no float/double
  *    anywhere in their type — including nested inside struct/array/map
  *    — because float keys group -0.0/NaN differently than the window
  *    exchange, which is protected by NormalizeFloatingNumbers, a rule
  *    that never fires on custom nodes;
  *  - the order is deterministic and resolvable against the child;
  *  - the limit conjunct is `rn <= k` / `rn < k` / `rn = 1` (or
  *    mirrored) with k no larger than
  *    `spark.graft.topk.rewriteLimitThreshold` (default 1000 — above
  *    that the k-row heaps stop being obviously cheaper than a spilling
  *    sort, same trade as Spark's window-group-limit threshold).
  *
  * Remaining filter conjuncts stay in a Filter above the new node (the
  * rank attribute keeps its exprId, so downstream references resolve
  * unchanged). An `InferWindowGroupLimit`-inserted WindowGroupLimit
  * child is absorbed: its prefilter is subsumed by the heap.
  *
  * Ties at the k boundary follow row_number semantics in both forms —
  * arbitrary unless the order is total. The rewrite preserves the
  * semantics, not any accidental tie choice; make the order total for
  * deterministic output (same contract as [[TopK.perKey]]).
  *
  * Installed by [[graft.GraftExtensions]] (session-wide, the engine
  * default — disable with `spark.graft.topk.autoRewrite=false`, which
  * turns the injected rule into a no-op while [[TopK.rewrite]] keeps
  * working as the explicit per-plan opt-in). With the default
  * `spark.graft.topk.onOverflow=sort` the rewrite is also
  * failure-compatible with the window form: a partition that exceeds
  * the key cap degrades to the same spilling sort the window would
  * have run, instead of hard-failing a previously-succeeding query. */
object RewriteWindowTopK
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{Alias, CurrentRow, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window, WindowGroupLimit}
  import org.apache.spark.sql.types.IntegerType

  /** The upper bound k when `e` bounds `rn` from above (a heap of k
    * rows then satisfies the conjunct by construction, so it can be
    * dropped); rn = 1 is the common "latest row per key" top-1 idiom. */
  private def limitOf(e: Expression, rn: Attribute): Option[Int] =
    e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1)
      case EqualTo(Literal(1, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  private def rowNumberFrame(we: WindowExpression): Boolean =
    we.windowFunction.isInstanceOf[RowNumber] &&
      (we.windowSpec.frameSpecification match {
        case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
        case _ => false
      })

  /** The rewritten plan for `Filter(cond, w)`, or None when any
    * equivalence guard fails. */
  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val threshold = conf.getConfString(
      "spark.graft.topk.rewriteLimitThreshold", "1000").toInt
    val maxKeys = conf.getConfString(
      "spark.graft.topk.maxKeysPerPartition",
      TopK.DefaultMaxKeysPerPartition.toString).toLong
    w match {
      case Window(Seq(a @ Alias(we: WindowExpression, _)), partSpec, orderSpec, wChild, _)
        if rowNumberFrame(we) &&
          partSpec.nonEmpty &&
          partSpec.forall {
            case attr: Attribute => !TopK.containsFloat(attr.dataType)
            case _ => false
          } &&
          orderSpec.nonEmpty && orderSpec.forall(_.deterministic) =>
        // absorb an InferWindowGroupLimit prefilter: same partition/order
        // semantics, and the heap bounds harder than the prefilter does
        val child = wChild match {
          case WindowGroupLimit(ps, os, _, _, gChild)
            if ps == partSpec && os == orderSpec => gChild
          case other => other
        }
        val rn = a.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
        val limits = conjuncts.flatMap(c => limitOf(c, rn))
        val orderResolvable =
          orderSpec.flatMap(_.references).forall(child.outputSet.contains)
        if (limits.isEmpty || !orderResolvable) None
        else {
          val k = limits.min
          if (k < 1 || k > threshold) None
          else {
            val keys = partSpec.map(_.asInstanceOf[Attribute])
            val topk = TopKPerKeyNode(child, keys, orderSpec, k, rn, maxKeys)
            // drop ONLY the conjuncts the heap bound subsumes; everything
            // else (including other rn predicates like rn >= 2) filters
            // above, against the same rank attribute
            val remaining = conjuncts.filterNot(c =>
              limitOf(c, rn).exists(_ >= k))
            Some(if (remaining.isEmpty) topk
            else Filter(remaining.reduce(
              org.apache.spark.sql.catalyst.expressions.And), topk))
          }
        }
      case _ => None
    }
  }

  /** Peel a chain of attributes-only (no alias, no computation)
    * Projects down to a Window node: such projections only reorder or
    * drop columns, so they commute with a filter on the rank attribute.
    * Returns the OUTERMOST projection list (it determines the output)
    * and the window. */
  private def peelToWindow(p: LogicalPlan): Option[(Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression], Window)] =
    p match {
      case org.apache.spark.sql.catalyst.plans.logical.Project(projList, child)
        if projList.forall(_.isInstanceOf[Attribute]) =>
        child match {
          case w: Window => Some((projList, w))
          case inner => peelToWindow(inner).map { case (_, w) => (projList, w) }
        }
      case _ => None
    }

  /** the actual rewrite — [[apply]] gates it on the session conf,
    * [[force]] (the [[TopK.rewrite]] path) applies it unconditionally */
  private[plans] def force(plan: LogicalPlan): LogicalPlan = plan.transform {
    // optimized-plan shape: the filter sits directly on the window
    case f @ Filter(cond, w: Window) =>
      tryRewrite(cond, w).getOrElse(f)
    // analyzed-plan shape (the per-plan TopK.rewrite path): withColumn
    // leaves attributes-only Projects between filter and window; rewrite
    // underneath and keep the outermost projection on top (TopK output =
    // window output ⊇ the projected attributes)
    case f @ Filter(cond, p: org.apache.spark.sql.catalyst.plans.logical.Project) =>
      peelToWindow(p).flatMap { case (projList, w) =>
        tryRewrite(cond, w).map(inner =>
          org.apache.spark.sql.catalyst.plans.logical.Project(projList, inner))
      }.getOrElse(f)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topk.autoRewrite", "true").toBoolean) plan
    else force(plan)
}

/** Column-level entry point: `TopK.perKey(df, keys, orderBy, k)` →
  * every input column plus a 1-based `rn` rank column, at most k rows
  * per key group. Plain (non-SortOrder) columns order ascending. */
object TopK {
  /** Per-partition distinct-key ceiling before the exec fails with a
    * sizing message instead of OOMing (see [[TopKPerKeyExec]] Scaladoc).
    * 2M keys × k=10 × ~100 B rows ≈ 2 GB/task worst case — inside a
    * typical executor's task share; override per session with
    * `spark.graft.topk.maxKeysPerPartition`. */
  val DefaultMaxKeysPerPartition: Long = 2000000L

  /** Apply [[RewriteWindowTopK]] to THIS plan only: the window-form df
    * comes back planned on the bounded-heap operator when the rewrite's
    * equivalence guards hold, unchanged otherwise. The per-plan twin of
    * installing the rule session-wide via `GraftExtensions` — useful
    * when only specific pipelines should opt in. */
  def rewrite(df: DataFrame): DataFrame = {
    Bridge.ensureStrategy(df.sparkSession, TopKPerKeyStrategy)
    Bridge.ensureOptimizerRule(df.sparkSession, PruneAsOfColumns)
    // force(), not apply(): the explicit per-plan opt-in works even when
    // spark.graft.topk.autoRewrite=false disables the session-wide rule
    Bridge.ofRows(df.sparkSession, RewriteWindowTopK.force(df.queryExecution.analyzed))
  }

  /** True when `dt` contains a float/double anywhere — top level or
    * nested in struct/array/map. Such grouping keys are rejected:
    * -0.0/NaN group differently than the NormalizeFloatingNumbers-
    * protected window exchange (the rule never fires on custom nodes). */
  private[plans] def containsFloat(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType => true
      case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
      case a: ArrayType => containsFloat(a.elementType)
      case m: MapType => containsFloat(m.keyType) || containsFloat(m.valueType)
      case _ => false
    }
  }

  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
      k: Int, rankCol: String = "rn"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keys.nonEmpty, "top-k per key requires at least one key column")
    require(orderBy.nonEmpty, "top-k per key requires at least one ordering " +
      "column — with no order the k kept rows per key are arbitrary")
    // case-insensitive: Spark's default resolution is case-insensitive,
    // so a column "RN" would make a later select("rn") ambiguous even
    // though an exact-match check passes
    require(!df.columns.exists(_.equalsIgnoreCase(rankCol)),
      s"rank column '$rankCol' collides with an existing input column " +
        "(case-insensitive); pass a different rankCol")
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
    // session-resolver semantics (case-insensitive by default) with an
    // ambiguity check — binding the first of two same-named columns
    // would group on the wrong one with no error
    val resolver = df.sparkSession.sessionState.conf.resolver
    def attr(name: String): Attribute = {
      val matches = plan.output.filter(a => resolver(a.name, name))
      if (matches.isEmpty) throw new IllegalArgumentException(
        s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}")
      require(matches.length == 1,
        s"column '$name' is ambiguous: ${matches.length} columns match")
      matches.head
    }
    keys.foreach { kc =>
      val dt = attr(kc).dataType
      // float keys (top-level OR nested in struct/array/map): -0.0/NaN
      // split groups (NormalizeFloatingNumbers never fires on custom
      // nodes) — reject, don't silently diverge from the window form
      require(!containsFloat(dt),
        s"top-k key '$kc' is $dt: keys containing float/double are not " +
          "supported (-0.0/NaN grouping diverges) — cast or bucket first")
    }
    val maxKeys = df.sparkSession.conf
      .getOption("spark.graft.topk.maxKeysPerPartition")
      .map { v =>
        try v.toLong catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"spark.graft.topk.maxKeysPerPartition must be a long, got '$v'")
        }
      }.getOrElse(DefaultMaxKeysPerPartition)
    require(maxKeys > 0,
      s"spark.graft.topk.maxKeysPerPartition must be positive, got $maxKeys")
    val node = TopKPerKeyNode(plan, keys.map(attr), order, k,
      AttributeReference(rankCol, LongType, nullable = false)(), maxKeys)
    Bridge.ofRows(df.sparkSession, node)
  }
}
