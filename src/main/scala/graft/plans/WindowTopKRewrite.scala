package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule completing the engine's Catalyst extension ladder
  * (expression → aggregator → plan+strategy → RULE): detects the
  * top-k-per-key pattern users actually write —
  *
  * {{{ df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
  *       .select(<columns not including rn>) }}}
  *
  * — and rewrites it to the [[TopKPerKey]] logical operator, whose
  * two-phase bounded-heap physical plan shuffles at most k rows per key
  * per partition instead of sorting the full relation under a window.
  * (Spark's own InferWindowGroupLimit bounds the window's input since
  * 3.5 but still plans the per-partition sort + Window; this replaces
  * both.)
  *
  * The rewrite fires only when it is provably safe:
  *  - the Window computes exactly ONE expression, a `row_number()`;
  *  - the filter is a simple bound on that column (`rn <= k`, `rn < k`,
  *    `k >= rn`, or `rn = 1`);
  *  - the projection above drops the rank column and references only
  *    the window's input columns (TopKPerKey preserves child output,
  *    so a surviving rank reference would be unresolvable).
  *
  * Determinism matches the source pattern: `row_number` over a
  * non-total order is already tie-nondeterministic, and TopKPerKey's
  * contract (see `TopK.perKey`) is the same — with a unique tie-break
  * both produce identical sets.
  *
  * Injected by [[graft.GraftExtensions]]; also usable per-session via
  * `spark.experimental.extraOptimizations`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitFrom(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) && k == 1 => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window)) =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)) =>
          // if Spark's InferWindowGroupLimit already ran, its logical
          // WindowGroupLimit sits under the Window — unwrap it, or its
          // per-partition sorts would survive beneath TopKPerKey
          val source = w.child match {
            case WindowGroupLimit(_, _, _, _, inner) => inner
            case other => other
          }
          limitFrom(cond, alias.toAttribute) match {
            // partitionSpec.nonEmpty: a global (partitionless) top-k
            // would build ClusteredDistribution(Nil), which Spark
            // rejects at planning — leave that shape to Spark's own
            // TakeOrderedAndProject path
            case Some(k) if k >= 1 && w.partitionSpec.nonEmpty &&
                projList.forall(_.references.subsetOf(source.outputSet)) =>
              Project(projList,
                TopKPerKey(k, w.partitionSpec, w.orderSpec, source))
            case _ => p
          }
        case _ => p
      }
  }
}
