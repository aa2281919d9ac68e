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
  * NO-SPILL CAVEAT: the per-task heap map is plain JVM memory, not
  * task-memory-manager accounted, and never spills — unlike the window-sort
  * form it replaces, whose ExternalSorter spills to disk. It is the right
  * operator when `keys-per-partition × k × rowSize` fits the executor heap
  * (e.g. ≤ ~10M distinct keys/partition at k=3 with small rows). Above
  * that bound, or when key cardinality is unknown, fall back to the
  * row_number window form (q10) — correctness is identical, it just sorts.
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
      TopKPerKeyExec(t.k, t.partExprs, t.order, t.rankAttr,
        planLater(t.child)) :: Nil
    case _ => Nil
  }
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

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val partLocal = partExprs
    val orderLocal = order
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      // per key: a max-heap (worst retained row on top) bounded at k
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row) // reused buffer: only copy on first sight
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val sorted = heap.dequeueAll.reverse // ascending by ord = rank order
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          val rankRow = InternalRow(i + 1)
          outProj(joined(row, rankRow))
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
