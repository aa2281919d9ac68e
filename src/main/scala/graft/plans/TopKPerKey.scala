package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (the (c) tier of the custom-op ladder): native
  * per-key top-k.
  *
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` — the
  * declarative form (q10) — forces a FULL sort of every key partition
  * before the rank filter throws away all but k rows per key. This
  * operator keeps a bounded k-element heap per key instead: one shuffle on
  * the keys, O(keys × k) memory, O(n log k) comparisons, no sort of the
  * n-row input. At 100 TB with small k the eliminated per-partition sort
  * is the dominant cost of the window form.
  *
  * MEMORY POSTURE: the per-task heap map is plain JVM memory (not
  * task-memory-manager accounted), bounded by a per-partition KEY BUDGET
  * (`spark.graft.topk.maxKeysPerPartition`, default 1M — ≤ budget × k
  * retained rows). When a partition's distinct-key count exceeds the
  * budget — unknown/unbounded key cardinality, the case that would OOM an
  * unaccounted map — the operator FALLS BACK, mid-partition, to the
  * window-sort strategy it replaces: every retained heap row plus the rest
  * of the input goes through Spark's accounted, disk-spilling
  * ExternalSorter on (keys, order), followed by a streaming rank pass.
  * The fallback is exact: a row evicted from a heap during phase 1 already
  * had k better rows for its key, so it can never re-enter the top-k.
  * Beyond the budget the heap's advantage is gone anyway (retained rows ≈
  * input rows), so the spillable sort is both the safe and the fast plan.
  *
  * Pieces: [[TopKPerKey]] (logical node), [[TopKStrategy]] (planner rule),
  * [[TopKPerKeyExec]] (physical operator), [[TopK.perKey]] (user API that
  * registers the strategy and wraps the plan as a DataFrame).
  */
final case class TopKPerKey(
    k: Int,
    partExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: AttributeReference, // constructor param: exprId must survive tree copies
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rank is produced here, not required from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan)
      : LogicalPlan = copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      // Map-side partial pass (the partial-aggregation pattern applied to
      // top-k): each upstream partition keeps only its own top k rows per
      // key BEFORE the exchange, so the shuffle carries at most
      // keys × k × mapPartitions rows instead of the full input. Exact by
      // the same argument as the heap itself — a row dropped by the
      // partial already had k better same-key rows in its partition, so it
      // can never be in the global top k.
      //
      // SIZE GATE (`auto`, the default): the pass only pays when the
      // avoided shuffle bytes dominate its extra O(n) pre-exchange scan;
      // below `spark.graft.topk.partial.minBytes` (256 MB) of estimated
      // child size the shuffle is small either way and the pass is pure
      // added CPU — measured: the trainer-loop queries (q135/q163), whose
      // per-round relations are vocabulary-sized, read a steady 7–15%
      // SLOWER with the partial forced on at sf0.1 (A/B/A/B, QBench
      // min-of-6), while at-scale inputs sail past any MB threshold. The
      // gate uses planning-time stats, so it adapts with input size
      // instead of being tuned to either local mode or the cluster;
      // `true`/`false` still force it for A/B.
      val partialConf = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.partial", "auto")
      val minBytes = BigInt(org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.partial.minBytes",
          (256L * 1024 * 1024).toString))
      val partial = partialConf match {
        case "true" => true
        case "false" => false
        case _ => t.child.stats.sizeInBytes >= minBytes
      }
      val child0 = planLater(t.child)
      val child =
        if (partial) TopKPartialExec(t.k, t.partExprs, t.order, child0)
        else child0
      TopKPerKeyExec(t.k, t.partExprs, t.order, t.rankAttr, child) :: Nil
    case _ => Nil
  }
}

/** Map-side companion of [[TopKPerKeyExec]]: reduces each input partition
  * to its local per-key top k rows (no rank column — ranks are assigned
  * after the exchange by the final operator). Requires nothing of its
  * child and never changes correctness: every row it drops provably has k
  * better same-key rows in the same partition. Two cheap exits keep it
  * from ever being a pessimization: (a) when the child is already
  * clustered on the keys no exchange follows and the final pass would redo
  * identical work, so the pass is skipped outright; (b) when a partition's
  * distinct-key count exceeds `spark.graft.topk.partial.maxKeys` (the
  * near-unique-key case where a heap map is pure overhead) the retained
  * rows plus the unread remainder stream through unchanged — unlike the
  * final operator, a partial needs no sort fallback because passing rows
  * through is always correct. */
final case class TopKPartialExec(
    k: Int,
    partExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    if (child.outputPartitioning.satisfies(ClusteredDistribution(partExprs)))
      return child.execute() // no exchange follows; final does this work
    val childOutput = child.output
    val kLocal = k
    val partLocal = partExprs
    val orderLocal = order
    val maxKeys = conf
      .getConfString("spark.graft.topk.partial.maxKeys", "131072").toInt
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      var over = false
      while (it.hasNext && !over) {
        val row = it.next()
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            over = heaps.size > maxKeys
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      // retained rows in any order (the final pass re-heaps), plus the
      // unread remainder verbatim when the key budget tripped
      heaps.valuesIterator.flatMap(_.iterator) ++ it
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

final case class TopKPerKeyExec(
    k: Int,
    partExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** Co-locate each key's rows; no child ordering required — that is the
    * point (the window form would demand a full sort here). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partExprs) :: Nil

  /** The heap pass is per-partition and preserves the child's partitioning
    * (mapPartitions, preservesPartitioning = true). Without this override
    * the default UnknownPartitioning hid the child's hash partitioning
    * from EnsureRequirements, so a downstream operator keyed on the SAME
    * columns (e.g. a second top-k per q_id after a partition-preserving
    * broadcast join, the q68 shortlist→rerank→rank shape) paid a
    * redundant Exchange. */
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val partLocal = partExprs
    val orderLocal = order
    val outAttrs = output
    // driver-side conf capture; see class doc for the budget semantics
    val maxKeys = conf
      .getConfString("spark.graft.topk.maxKeysPerPartition", "1000000").toInt
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      // per key: a max-heap (worst retained row on top) bounded at k
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      // phase 1: bounded heap map — stops (keeping `it`'s remainder) the
      // moment the key budget is exceeded
      var over = false
      while (it.hasNext && !over) {
        val row = it.next()
        val key = keyProj(row) // reused buffer: only copy on first sight
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            over = heaps.size > maxKeys
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      if (!over) {
        heaps.iterator.flatMap { case (_, heap) =>
          val sorted = heap.dequeueAll.reverse // ascending by ord = rank order
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            val rankRow = InternalRow(i + 1)
            outProj(joined(row, rankRow))
          }
        }
      } else {
        // phase 2 fallback: the window-sort strategy, under memory
        // accounting. Retained heap rows + the unread remainder sort by
        // (keys, order) in Spark's spillable ExternalSorter; a streaming
        // pass then ranks within each key run. Exactness: every dropped
        // phase-1 row had k better same-key rows already retained.
        val sortOrder = partLocal.map(e =>
          SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)) ++
          orderLocal
        val fullOrd = GenerateOrdering.generate(sortOrder, childOutput)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        val retained = heaps.valuesIterator.flatMap(_.iterator)
        val all = (retained ++ it).map(r => toUnsafe(r).copy())
        val sortedRows = org.apache.spark.sql.graftshim.SpillSorter
          .sorted(all, fullOrd)
        var curKey: UnsafeRow = null
        var rank = 0
        sortedRows.flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) {
            curKey = key.copy()
            rank = 0
          }
          rank += 1
          if (rank <= kLocal)
            Iterator.single(outProj(joined(row, InternalRow(rank))))
          else Iterator.empty
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

/** User-facing API. */
object TopK {

  /** Top `k` rows per key by `orderBy` (`(column, ascending)` pairs, later
    * entries as tie-breaks), with a 1-based `rank` column appended. For a
    * deterministic result the ordering should be total (include a unique
    * tie-break column) — same caveat as the row_number window form.
    * Columns are resolved by name against the input's analyzed plan (a
    * custom logical node's expressions are not visited by the analyzer's
    * column resolution, so they must enter pre-resolved). Registers
    * [[TopKStrategy]] on the session (idempotent). */
  def perKey(df: DataFrame, k: Int, partCols: Seq[String],
      orderBy: Seq[(String, Boolean)]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(partCols.nonEmpty, "at least one partition column required")
    require(orderBy.nonEmpty, "at least one ordering column required")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no column $name in ${analyzed.output.map(_.name)}"))
    val sortOrders = orderBy.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val rankAttr =
      AttributeReference("rank", IntegerType, nullable = false)()
    Bridge.ofRows(spark,
      TopKPerKey(k, partCols.map(attr), sortOrders, rankAttr, analyzed))
  }
}
