package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.GroupBitmap

/** Opt-in Catalyst optimizer rule (`Rule[LogicalPlan]`, injected via
  * [[graft.GraftExtensions]]): rewrite `count(DISTINCT x)` over a
  * BIGINT column into the roaring-bitmap aggregate
  * ([[graft.functions.GroupBitmap]]).
  *
  * Why: Spark plans a distinct aggregate as Expand + TWO exchanges
  * (rows re-shuffled keyed by (group, x) and again by group), with the
  * full distinct value set as intermediate rows. GroupBitmap is one
  * exchange whose partials are compressed bitmaps — the reference's own
  * series-dedup state shape — so at 100 TB the wire carries bitmap
  * bytes instead of the value set. Semantics are identical for BIGINT:
  * both ignore NULLs and return a non-null 0 for all-NULL groups
  * (pinned in GraftExtensionsSpec).
  *
  * Deliberately opt-in (`spark.graft.rewriteExactDistinct=true`):
  * engine-level plan rewrites that change EXPLAIN output under users'
  * feet should be a dial, not a default. Scope guards: exactly one
  * argument, LongType, any FILTER clause preserved; multi-arg
  * distincts and other types are left to Spark's planner.
  */
object RewriteExactDistinct extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.rewriteExactDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(c)), _, true, _, _)
              if c.dataType == LongType =>
            // copy keeps the resultId, so the Aggregate's output
            // attributes (and anything referencing them) stay bound
            ae.copy(aggregateFunction = GroupBitmap(c), isDistinct = false)
        }
    }
}
