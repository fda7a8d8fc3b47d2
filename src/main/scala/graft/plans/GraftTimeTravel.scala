package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** `VERSION AS OF` SQL surface for snapshot-lite tables — the Iceberg
  * SQL form (reference `README.md:11` runs on Iceberg snapshots), so
  * `SELECT * FROM observations VERSION AS OF 3` works through
  * [[graft.lake.Lakehouse.query]] exactly like the programmatic
  * `load(table, asOf = 3)`.
  *
  * Spark's parser already produces [[RelationTimeTravel]] for the
  * syntax; only resolution is catalog-specific. The rule rewrites
  * `RelationTimeTravel(UnresolvedRelation(t), version = Some(v))` to
  * the registered manifest-resolved plan for `t` BEFORE the built-in
  * `ResolveRelations` sees it — injected into the analyzer's Hints
  * batch (which runs ahead of Resolution), because `ResolveRelations`
  * hard-fails time travel over a temp view and the lakehouse registers
  * its current-version tables as temp views under the same names.
  *
  * Sessions register per-table resolvers (version → analyzed plan) via
  * [[GraftTimeTravel.register]]; unregistered names fall through to
  * the built-in behavior untouched, so the rule is invisible outside
  * lakehouse tables.
  */
object GraftTimeTravel {

  /** (session identity, lowercase table name) → version → analyzed
    * plan. Resolution happens at ANALYSIS time against the manifest,
    * so a pinned version keeps resolving even after later rewrites
    * (the archive-aware readRels path). Keyed by the session OBJECT
    * so concurrent sessions over different warehouses never cross.
    *
    * Lifecycle: entries for STOPPED sessions are swept on every
    * register (the resolver closures capture the session and its
    * analyzed plans — without the sweep a closed session would stay
    * strongly reachable from this global map forever). Within one
    * live session the name space is intentionally session-global and
    * last-write-wins — the same semantics as the temp views the
    * lakehouse registers alongside: two Lakehouse instances over
    * different warehouses sharing a session contend for the NAME, not
    * the resolver map, and `Lakehouse.query` re-registers its own
    * tables before parsing so its results always resolve against its
    * own warehouse. */
  private val resolvers =
    TrieMap.empty[(SparkSession, String), Int => LogicalPlan]

  def register(session: SparkSession, table: String,
      resolve: Int => LogicalPlan): Unit = {
    resolvers.keysIterator.foreach { k =>
      if (k._1.sparkContext.isStopped) resolvers.remove(k)
    }
    resolvers.put((session, table.toLowerCase), resolve)
  }

  private[plans] def lookup(session: SparkSession,
      name: String): Option[Int => LogicalPlan] =
    resolvers.get((session, name.toLowerCase))
}

case class ResolveGraftTimeTravel(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
          if u.multipartIdentifier.sizeIs == 1 &&
            GraftTimeTravel.lookup(session,
              u.multipartIdentifier.head).isDefined =>
        val resolve =
          GraftTimeTravel.lookup(session, u.multipartIdentifier.head).get
        val version =
          try v.trim.toInt
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"VERSION AS OF on '${u.multipartIdentifier.head}' " +
                  s"needs an integer snapshot version, got '$v'")
          }
        resolve(version)
    }
}
