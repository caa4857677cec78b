package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog}

/** Analyzer resolution rule: resolve relations that name a VIEW in a
  * DSv2 [[ViewCatalog]] — Spark 4.1's built-in analyzer does not yet
  * consult the interface during name resolution (verified against the
  * shipped jars), so without this rule a wire-catalog view
  * (`SELECT … FROM restvw.graft.events_wview`, served by
  * [[graft.endpoint.RestCatalog]]'s Iceberg REST views routes) is an
  * unresolved-relation error and clients must call the
  * [[graft.sources.RestBackedCatalog.wireView]] shim. With the rule
  * installed — via `spark.sql.extensions=graft.GraftExtensions`, or
  * at runtime with [[graft.sources.RestBackedCatalog
  * .ensureViewResolution]] for sessions created afterwards — plain
  * `spark.sql` resolves the view: its SQL representation is loaded
  * over the catalog, parsed, and substituted inline, with bare inner
  * table names qualified against the VIEW's own catalog/namespace so
  * every base table resolves back through the same wire mount
  * (Trino resolving a Lakekeeper view; the shim stays the documented
  * fallback for pre-materialized sessions).
  *
  * Ordering: the built-in ResolveRelations runs first in each
  * fixed-point iteration, so temp views and real tables (including
  * wire-mounted tables) always win; this rule only sees relations
  * the built-ins left unresolved, and only acts when the addressed
  * catalog is a [[ViewCatalog]] serving that view name. Nested views
  * expand one layer per iteration; a cyclic definition surfaces as
  * the analyzer's max-iterations error rather than a hang.
  */
case class ResolveWireViews(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming =>
        lookup(u).getOrElse(u)
    }

  private def lookup(u: UnresolvedRelation): Option[LogicalPlan] = {
    val cm = session.sessionState.catalogManager
    val (catName, ns, name) = u.multipartIdentifier match {
      case Seq(c, n, v) => (c, Seq(n), v)
      case Seq(n, v) => (cm.currentCatalog.name, Seq(n), v)
      case Seq(v) => (cm.currentCatalog.name, cm.currentNamespace.toSeq, v)
      case _ => return None // deeper nesting is not a view address here
    }
    val viewCat = (try cm.catalog(catName) catch {
      case _: Exception => return None // unknown catalog: not ours to error
    }) match {
      case vc: ViewCatalog => vc
      case _ => return None
    }
    val view: View =
      try viewCat.loadView(Identifier.of(ns.toArray, name))
      catch {
        case _: NoSuchViewException => return None // a table (or absent):
        // leave it for the built-in resolution (and its error message)
        case _: Exception => return None
      }
    val parsed = session.sessionState.sqlParser.parsePlan(view.query)
    Some(SubqueryAlias(name, qualify(inlineCtes(parsed),
      view.currentCatalog, view.currentNamespace.toSeq)))
  }

  /** Inline the WITH clauses of a parsed view body. The analyzer's
    * own CTESubstitution lives in the Substitution batch, which has
    * already run by the time this rule splices the body into the
    * plan — an [[UnresolvedWith]] spliced now would never substitute
    * (and its definitions are not children, so name qualification
    * would miss them too). Legacy-inline semantics: every reference
    * is replaced by its aliased definition; later definitions may
    * reference earlier ones.
    */
  private def inlineCtes(plan: LogicalPlan): LogicalPlan = plan match {
    case w: UnresolvedWith =>
      val defs = w.cteRelations.foldLeft(Map.empty[String, LogicalPlan]) {
        case (acc, (cteName, defPlan, _)) =>
          acc + (cteName.toLowerCase -> substituteCtes(inlineCtes(defPlan), acc))
      }
      substituteCtes(inlineCtes(w.child), defs)
    case other => other
  }

  private def substituteCtes(plan: LogicalPlan,
      defs: Map[String, LogicalPlan]): LogicalPlan =
    plan.transformUpWithSubqueries {
      case w: UnresolvedWith => inlineCtes(w) // a nested WITH scopes itself
      case ur: UnresolvedRelation if ur.multipartIdentifier.size == 1 =>
        defs.getOrElse(ur.multipartIdentifier.head.toLowerCase, ur)
    }

  /** Qualify the view body's table names against the VIEW's own
    * catalog/namespace (the context its author wrote it in), so a
    * bare `events` or `graft.events` inside the definition resolves
    * through the view's wire catalog, not the caller's current one.
    * Runs AFTER [[inlineCtes]], so every remaining bare name is a
    * real table reference.
    */
  private def qualify(plan: LogicalPlan, viewCat: String,
      viewNs: Seq[String]): LogicalPlan =
    plan.transformUpWithSubqueries {
      case ur: UnresolvedRelation if ur.multipartIdentifier.size == 1 =>
        ur.copy(multipartIdentifier =
          (viewCat +: viewNs) :+ ur.multipartIdentifier.head)
      case ur: UnresolvedRelation if ur.multipartIdentifier.size == 2 =>
        ur.copy(multipartIdentifier = viewCat +: ur.multipartIdentifier)
    }
}
