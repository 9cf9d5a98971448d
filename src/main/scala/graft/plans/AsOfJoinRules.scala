package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.PredicateHelper

/** Optimizer rules for [[AsOfJoinNode]] — the `Rule[LogicalPlan]` rung
  * of SURVEY §7.4's extension ladder (expressions and a
  * Strategy/SparkPlan are the other two). Catalyst's own
  * PushDownPredicates / ColumnPruning stop at nodes they don't know,
  * so without these a custom operator silently turns off the two
  * optimizations that matter most at 100 TB: filters stay ABOVE the
  * join's shuffle+sort, and both children carry every column through
  * the exchange. Both rules are fixed-point-safe (each fires only when
  * it changes the plan) and registered alongside the strategy in
  * `GraftExtensions` and `NativeAsOfJoin.backward`.
  */
object AsOfJoinRules {

  /** Push deterministic left-only conjuncts below the join. Safe
    * because the as-of match of a left row depends only on that row
    * and the RIGHT side: dropping other left rows changes nothing.
    * Right-side conjuncts must stay above — right payload null-extends
    * (outer-join semantics), so filtering the right child would turn
    * would-be matches into spurious null rows (and break `IS NULL`
    * probes above).
    */
  object PushFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, j: AsOfJoinNode) =>
        val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
          c.deterministic && c.references.subsetOf(j.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = j.copy(left = Filter(push.reduce(And), j.left))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Prune child columns a parent Project doesn't need (keeping the
    * join's own key/ts/tie references), so unused payload never enters
    * the exchange+sort the exec's distribution contract inserts.
    */
  object PruneAsOfColumns extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(_, j: AsOfJoinNode)
          if (j.outputSet -- p.references -- j.references).nonEmpty =>
        val need = AttributeSet(p.references ++ j.references)
        p.copy(child = j.copy(
          left = Project(j.left.output.filter(need.contains), j.left),
          right = Project(j.right.output.filter(need.contains), j.right)))
    }
  }

  val all: Seq[Rule[LogicalPlan]] =
    Seq(PushFilterThroughAsOf, PruneAsOfColumns)
}
