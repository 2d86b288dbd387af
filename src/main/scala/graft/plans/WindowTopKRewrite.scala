package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the injectOptimizerRule category of
  * SparkSessionExtensions): rewrites the ubiquitous
  *
  *   Project(cols…, Filter(rn <= k, Window([row_number() AS rn], g, o)))
  *
  * pattern — the reference's master-dedup idiom
  * (04_sales_enrich_sp.sql:43-47) — into [[TopKPerGroup]], eliminating
  * both the per-group sort and the rank computation entirely, provided
  * the projection does not use `rn`. Spark's own InferWindowGroupLimit
  * (3.5+) only bounds the window's INPUT per group; the rewrite removes
  * the window operator altogether.
  *
  * Fires only when the rank attribute is dead above the filter; ties
  * were already nondeterministic under row_number, so the heap's tie
  * behavior is no worse.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private object RankLimit {
    /** cond on `rn` → max rank k. */
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(1, _)) => Some((a, 1))
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) =>
        Some((a, k))
      case _ => None
    }
  }

  /** InferWindowGroupLimit may already have bounded the window input —
    * strip it, TopKPerGroup subsumes it. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case wgl: WindowGroupLimit => wgl.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case proj @ Project(projectList,
        Filter(RankLimit(rnAttr, k),
          w @ Window(Seq(a @ Alias(WindowExpression(RowNumber(), spec), _)),
            part, order, wchild, _)))
        if k >= 1 && order.nonEmpty && part.nonEmpty &&
          // the filtered attribute must BE the row_number alias — a
          // filter on an unrelated column must not become a top-k
          rnAttr.exprId == a.exprId &&
          spec.partitionSpec == part && spec.orderSpec == order &&
          projectList.forall(ne => !ne.references.contains(rnAttr)) =>
      proj.copy(child = TopKPerGroup(part, order, k,
        stripGroupLimit(wchild)))
  }
}
