package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (SURVEY.md §2.2.10 — the `Rule[LogicalPlan]`
  * extension point, completing the matrix beside the native
  * Expressions and the TopKPerGroup logical node + strategy): rewrite
  * the ubiquitous window-rank-filter idiom
  *
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * into the heap-based [[TopKPerGroup]] operator. Spark's own
  * InferWindowGroupLimit only inserts a WindowGroupLimit PRE-filter and
  * still sorts every partition and evaluates the window; this rule
  * replaces the whole composite (the WindowGroupLimit, when present, is
  * stripped — TopKPerGroup subsumes it), eliminating the partition sort
  * and the rank column materialization. Fires only when the rewrite is
  * provably invisible:
  *   - exactly one window expression and it is row_number();
  *   - the filter is a sole `rank ⋚ integer-literal` comparison;
  *   - the projection above drops the rank column and passes child
  *     attributes through unchanged;
  *   - the grouping is non-empty (TopKPerGroup's distribution contract).
  * Like the idiom itself, the result is deterministic only under a
  * total per-group order — the rule changes WHICH ties survive no more
  * than re-running the window does.
  *
  * Install: GraftExtensions (session build) or scoped via
  * `spark.experimental.extraOptimizations` (q120 does this around its
  * own execution so harness-shared sessions keep their default plans).
  */
object RankFilterToTopK extends Rule[LogicalPlan] {

  private def limitFrom(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.exprId == rank.exprId => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.exprId == rank.exprId => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.exprId == rank.exprId => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) if a.exprId == rank.exprId => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, IntegerType)) if a.exprId == rank.exprId && v == 1 => Some(1)
    case EqualTo(Literal(v: Int, IntegerType), a: Attribute) if a.exprId == rank.exprId && v == 1 => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window)) =>
      val rewritten = for {
        alias <- w.windowExpressions match {
          case Seq(a: Alias) => Some(a)
          case _ => None
        }
        _ <- alias.child match {
          case WindowExpression(RowNumber(), _) => Some(())
          case _ => None
        }
        k <- limitFrom(cond, alias.toAttribute)
        if k > 0 && w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
          projectList.forall {
            case a: Attribute => a.exprId != alias.exprId && w.child.outputSet.contains(a)
            case _ => false
          }
      } yield {
        val child = w.child match {
          // Spark's InferWindowGroupLimit pre-filter passes exactly the
          // per-group rank<=limit candidates; TopKPerGroup recomputes
          // that selection itself, so keeping the node would only add a
          // redundant per-partition pass.
          case wgl: WindowGroupLimit => wgl.child
          case c => c
        }
        Project(projectList, TopKPerGroup(w.partitionSpec, w.orderSpec, k, child))
      }
      rewritten.getOrElse(p)
  }
}
