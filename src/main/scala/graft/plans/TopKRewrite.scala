package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber,
  SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the Rule side of the Expression / Rule / Strategy
  * triad): rewrites the window-form per-key top-k pattern
  *
  * {{{ Filter(rn <= k, Window([row_number() over (partition by p order by o)] as rn)) }}}
  *
  * into the native [[TopKPerKey]] logical operator — so a user writing the
  * textbook `row_number + filter` automatically gets bounded per-key heaps
  * (no full sort of every key partition) once the rule and
  * [[TopKStrategy]] are injected via `GraftExtensions` (or
  * `spark.experimental.extraOptimizations`).
  *
  * Deliberately conservative — it fires only when the rewrite is
  * definitionally equivalent:
  *  - the Window computes EXACTLY ONE expression, a plain `row_number()`
  *    with the default ROWS UNBOUNDED PRECEDING..CURRENT ROW frame;
  *  - the filter is `rn <= lit` / `rn < lit` on that attribute alone
  *    (conjunctions are left to the predicate-pushdown rules to split);
  *  - k >= 1 after normalizing `<` to `<=`.
  * The rewritten node keeps the ORIGINAL rank attribute (same exprId), so
  * downstream references and the output schema are untouched. Rank
  * assignment order within ties follows the orderSpec exactly as the
  * window form does: with a non-total order both forms are equally
  * nondeterministic, with a tie-broken order both are deterministic.
  *
  * NOTE the no-spill caveat on [[TopKPerKey]]: the rule trades the
  * window's spillable sort for in-memory heaps, which is the right trade
  * below ~10M distinct keys per partition (see TopKPerKey docs). Because
  * the heaps hold O(keys × k) rows with no spill path, the rule refuses
  * k > [[TopKRewrite.MaxK]] (a large k erodes the heap's win over the
  * spillable sort anyway), and `spark.graft.topk.rewrite=false` disables
  * it per session without unregistering the extension.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Largest k the rewrite accepts; beyond this the window-sort's spill
    * path is the safer plan. */
  val MaxK = 4096

  private def enabled: Boolean =
    conf.getConfString("spark.graft.topk.rewrite", "true").toBoolean

  private def asTopK(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, _: SpecifiedWindowFrame)), _)) =>
        val rankAttr = a.toAttribute
        val kOpt = cond match {
          case LessThanOrEqual(attr: AttributeReference, IntegerLiteral(k))
              if attr.exprId == rankAttr.exprId => Some(k)
          case LessThan(attr: AttributeReference, IntegerLiteral(k))
              if attr.exprId == rankAttr.exprId => Some(k - 1)
          case _ => None
        }
        kOpt.collect {
          case k if k >= 1 && k <= MaxK && part.nonEmpty =>
            TopKPerKey(k, part, order,
              rankAttr.asInstanceOf[AttributeReference], w.child)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan transformUp {
      case f @ Filter(cond, w: Window) => asTopK(cond, w).getOrElse(f)
    }
}
