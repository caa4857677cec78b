package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions
import graft.plans.AsOfJoinStrategy

/** Production registration path: install everything via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) — planner strategy for the
  * as-of operator plus every graft_* SQL function. The runtime
  * alternative (for sessions you didn't create) is
  * `GraftFunctions.register` + lazy strategy injection in
  * `plans.AsOf`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // DSv2 ViewCatalog views in plain spark.sql — Spark 4.1's analyzer
    // doesn't consult the interface itself (see ResolveWireViews)
    e.injectResolutionRule(s => graft.plans.ResolveWireViews(s))
    e.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
    e.injectOptimizerRule(_ => graft.plans.PushLimitThroughAsOfJoin)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    e.injectOptimizerRule(_ => graft.plans.SnapshotScanPruning)
    // after pushdown (which wraps V1 scans), before stats consumers —
    // exactly what the pre-CBO slot exists for
    e.injectPreCBORule(_ => graft.plans.ForwardV1ScanStatistics)
    // one shared builder list (GraftFunctions.builders) feeds both
    // registration paths, so the SQL surfaces cannot diverge
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
  }
}
