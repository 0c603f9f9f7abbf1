package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §2.H10): rewrite the ubiquitous
  * "row_number() ... WHERE rn <= k, rn then dropped" idiom into the
  * TopKPerGroup physical shape — the window form sorts and shuffles
  * the entire input to keep k rows per group; the rewritten form
  * shuffles survivors only.
  *
  * Deliberately narrow match (no false positives over semantics):
  *   Project(cols not using rn,
  *     Filter(rn <= K | rn < K, Window([rn := row_number() over
  *       (partition p order o)], p, o, child)))
  * with the filter referencing ONLY the rank attribute. Tie behavior
  * at the k boundary is arbitrary in both forms unless the order is
  * total — exactly the SQL contract of row_number itself.
  *
  * Registered via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _))
        if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, _))
        if a.semanticEquals(rank) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute)
        if a.semanticEquals(rank) => Some(k)
      // rn = 1 — the argmax-per-group idiom (C39 keep-best). Only
      // k=1 is a prefix: rn = k for k > 1 selects the k-th row
      // alone, which top-k does not express.
      case EqualTo(a: Attribute, Literal(1, _))
        if a.semanticEquals(rank) => Some(1)
      case EqualTo(Literal(1, _), a: Attribute)
        if a.semanticEquals(rank) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, order, _)), _)),
            wPart, wOrder, child, _)))
        if order.nonEmpty &&
          part == wPart && order == wOrder &&
          cond.references.subsetOf(AttributeSet(alias.toAttribute)) &&
          !projList.exists(_.references.contains(alias.toAttribute)) &&
          projList.forall(_.references.subsetOf(child.outputSet)) =>
      limitOf(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          // Spark's own InferWindowGroupLimit may already have slid a
          // WindowGroupLimit under the Window (it runs in the main
          // optimizer batch, before extra rules). TopKPerGroup
          // subsumes it — keeping both would group-limit twice.
          val base = child match {
            case WindowGroupLimit(p2, o2, _, k2, grandchild)
              if p2 == part && o2 == order && k2 >= k => grandchild
            case other => other
          }
          Project(projList, TopKPerGroupPlan(k, part, order, base))
        case _ => p
      }
  }
}
