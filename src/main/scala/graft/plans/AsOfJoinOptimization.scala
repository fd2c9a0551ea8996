package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for [[AsOfJoin]]. Catalyst's PushDownPredicates and
  * ColumnPruning only know the built-in nodes, so without these rules a
  * custom operator becomes an optimization BARRIER: filters stay above
  * it (the scan reads everything) and both children carry every column
  * (the scan reads full-width rows). At 100 TB that is the difference
  * between scanning a pruned column slice behind a pushed predicate and
  * scanning the whole table — so a whole-operator extension is not done
  * until its optimizer rules exist. Both rules are registered through
  * `injectOptimizerRule` (see `graft.functions.GraftExtensions`) and
  * run to fixpoint with the main operator-optimization batch.
  */
object AsOfJoinOptimization {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Push deterministic conjuncts that reference only LEFT-side
    * attributes below the join: every output row corresponds 1:1 to a
    * left row, so a left-only filter commutes exactly. Right-side
    * conjuncts must NOT be pushed — above the join they drop already-
    * matched rows (null-extended ones via null predicates), below it
    * they would change WHICH right row matches. */
  object PushLeftFilters extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, j: AsOfJoin) =>
        val (push, keep) = splitConjuncts(cond).partition(p =>
          p.deterministic && p.references.subsetOf(j.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = j.copy(left = Filter(push.reduce(And), j.left))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Prune join-child columns to what the parent projection references
    * plus the join's own keys and times. AsOfJoin.output derives from
    * the children, so narrowing the children narrows the node — the
    * parquet ReadSchema under each side shrinks to the used slice. */
  object PruneChildColumns extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(_, j: AsOfJoin) =>
        val needed = AttributeSet(p.references.toSeq) ++
          AttributeSet(j.leftKeys.flatMap(_.references)) ++
          AttributeSet(j.rightKeys.flatMap(_.references)) ++
          j.leftTime.references ++ j.rightTime.references
        val lKeep = j.left.output.filter(needed.contains)
        val rKeep = j.right.output.filter(needed.contains)
        if (lKeep.length == j.left.output.length &&
            rKeep.length == j.right.output.length) p
        else p.copy(child = j.copy(
          left = Project(lKeep, j.left),
          right = Project(rKeep, j.right)))
    }
  }
}
