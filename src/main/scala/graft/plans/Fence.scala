package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** An optimization fence: a pass-through logical node that logical
  * optimizer rules do not recognize and therefore do not rewrite
  * across — `PushDownPredicates` cannot push a filter below it and
  * `CollapseProject` cannot inline a projection through it — planned
  * to NOTHING (the child's physical plan, same codegen fusion, zero
  * runtime cost) by [[FenceStrategy]] once logical optimization is
  * over.
  *
  * Why it exists: Catalyst freely substitutes aliases when pushing
  * predicates through projections. For a cheap alias that is the right
  * call; for an expensive one (`from_json` over a whole wire frame,
  * shingle-set construction) it duplicates the computation into every
  * consuming operator — the mixed-decode plan evaluated its JSON parse
  * up to 9× per row before this fence (filter pushdown + project
  * collapse), the per-operator codegen CSE notwithstanding. Fencing
  * the parse projection pins the plan to "parse once, then reference
  * the struct attribute", which is also the only shape that survives
  * a 100× scale-up of the decode path.
  *
  * The cost: predicates above the fence stop short of the scan. Fence
  * ONLY a projection whose inputs are already minimal (the parse
  * project reads just the raw string column), so nothing is lost —
  * pruning inside the fenced subtree still works, and selective
  * filters above it run against the parsed attribute, not the parser.
  */
final case class Fence(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): Fence =
    copy(child = newChild)
}

object Fence {
  /** Wrap a DataFrame in a fence. Self-arming: [[FenceStrategy]] is
    * added to the session's planner if missing, so a fenced plan can
    * always be planned — even on sessions that never ran
    * `Graft.install` (e.g. an embedding application's own session).
    */
  def wrap(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(FenceStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ FenceStrategy
    org.apache.spark.sql.graft.Bridge.withPlan(df, Fence(_))
  }
}

/** Plans [[Fence]] away: the physical plan is exactly the child's. */
object FenceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Fence(child) => planLater(child) :: Nil
    case _            => Nil
  }
}
