package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.optimizer.PushDownPredicates
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** The `Rule[LogicalPlan]` tier of the extension ladder: Catalyst cannot
  * optimize THROUGH an operator it doesn't know, so a custom node silently
  * turns off predicate pushdown and column pruning for everything beneath
  * it — at 100 TB that is the difference between scanning a partition and
  * scanning the lake. These two rules restore both for [[AsOfJoin]] and are
  * registered alongside the strategy (`GraftExtensions` for declarative
  * deployment, `experimental.extraOptimizations` via `AsOf.register`).
  */
object AsOfRules {

  /** Pushes filters through [[AsOfJoin]].
    *
    * Left-only predicates move below the join unchanged (every output row
    * extends exactly one left row, so filtering before == filtering
    * after). Predicates over left KEYS are additionally MIRRORED onto the
    * matching right keys: once the surviving left rows all satisfy the key
    * predicate, right rows failing it can never match — pruning the right
    * scan too. Right-side predicates never move (null-extension would
    * change their result). After splicing, Catalyst's own
    * `PushDownPredicates` runs on each rewritten child so the spliced
    * filters keep sinking through the child's projects/filters into the
    * scan — this makes the rule self-contained even when hosted in a
    * post-hoc batch (`experimental.extraOptimizations`) that runs after
    * the main pushdown fixpoint.
    */
  object PushThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
    private def sinkAll(plan: LogicalPlan): LogicalPlan = {
      var p = plan; var prev: LogicalPlan = null
      var i = 0
      while (p ne prev) { prev = p; p = PushDownPredicates(p); i += 1
        if (i > 20) return p }
      p
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, a: AsOfJoin) =>
        // span, not partition: everything at or after the first
        // non-deterministic conjunct stays put (Catalyst's convention —
        // pushing a later deterministic conjunct would change the row
        // sequence a rand()-style predicate evaluates over)
        val (deterministic, rest0) =
          splitConjunctivePredicates(cond).span(_.deterministic)
        val (leftOnly, rest1) =
          deterministic.partition(_.references.subsetOf(a.left.outputSet))
        if (leftOnly.isEmpty) {
          f
        } else {
          // left key attr → right key attr, for attribute-to-attribute keys
          val keyMap = AttributeMap(a.leftKeys.zip(a.rightKeys).collect {
            case (lk: Attribute, rk: Attribute) => lk -> rk
          })
          val leftKeyAttrs = AttributeSet(keyMap.keys.toSeq)
          val mirrored = leftOnly
            .filter(_.references.subsetOf(leftKeyAttrs))
            .map(_.transform { case att: Attribute => keyMap(att) })
          val newLeft = sinkAll(Filter(leftOnly.reduce(And), a.left))
          val newRight = if (mirrored.isEmpty) a.right
            else sinkAll(Filter(mirrored.reduce(And), a.right))
          val pushed = a.copy(left = newLeft, right = newRight)
          val remaining = rest1 ++ rest0
          if (remaining.isEmpty) pushed
          else Filter(remaining.reduce(And), pushed)
        }
    }
    private def And(l: Expression, r: Expression) =
      org.apache.spark.sql.catalyst.expressions.And(l, r)
  }

  /** Prunes unused columns below [[AsOfJoin]]: when a parent `Project`
    * uses a subset of the join's output, each child narrows to (used
    * columns + its join keys/time/tie). With the children narrowed,
    * Catalyst's own `ColumnPruning` keeps shrinking the child plans down
    * to the scan (`ReadSchema`).
    */
  object PruneThroughAsOf extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(_, a: AsOfJoin)
          if (a.outputSet -- p.references).nonEmpty =>
        val needed = p.references ++
          AttributeSet((a.leftKeys ++ a.rightKeys ++ a.rightTie)
            .flatMap(_.references)) ++
          a.leftTime.references ++ a.rightTime.references
        def narrow(child: LogicalPlan): LogicalPlan = {
          val keep = child.output.filter(needed.contains)
          if (keep.size == child.output.size) child else Project(keep, child)
        }
        val (nl, nr) = (narrow(a.left), narrow(a.right))
        if ((nl eq a.left) && (nr eq a.right)) p
        else p.copy(child = a.copy(left = nl, right = nr))
    }
  }
}
