package graft.plans

import graft.sources.CorpusLayout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, MergeIntoTable}
import org.apache.spark.sql.catalyst.rules.Rule

/** Serve the COMPOSED view through the catalog NAME (SURVEY §2.H): a
  * `graft_cl_` table whose served generation carries a deletion-vector
  * sidecar or a column mapping must never be read raw — a plain
  * `SELECT * FROM graft_cl_…` over a MOR generation would resurrect
  * deleted rows and lose updates (the base files are hard links by
  * design), and over a mapped one would expose dropped/renamed physical
  * names plus the internal `_zv` column. `Tables.load`/`ifPresent`
  * compose explicitly; this rule closes the SQL spelling the MERGE INTO
  * and VERSION AS OF surfaces legitimize.
  *
  * Placement and shape mirror [[TimeTravelLayoutRule]]: hint-batch
  * (BEFORE the Resolution batch), matching the relation by NAME — early
  * substitution means every reference above resolves against the
  * composed (logical) output naturally, with no exprId rebinding, and
  * queries naming dropped/physical columns fail as ordinary unresolved
  * columns. The substituted base is a non-catalog relation, so the rule
  * can never re-match inside its own replacement. Generations needing
  * no composition keep the stock catalog path (zero overhead, relation
  * cache intact). Carve-outs: MERGE INTO targets stay unresolved-named
  * for [[MergeIntoLayoutRule]] to claim (its lowering resolves the
  * target itself — composed — via the layout verbs), and INSERT targets
  * keep Spark's stock write-path behavior.
  */
class ComposedServingRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val excluded = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case m: MergeIntoTable => m.targetTable.foreach {
        case u: UnresolvedRelation => excluded.add(u)
        case _ => ()
      }
      case i: InsertIntoStatement => i.table.foreach {
        case u: UnresolvedRelation => excluded.add(u)
        case _ => ()
      }
      case _ => ()
    }
    plan.transformUp {
      case u: UnresolvedRelation
          if !excluded.contains(u) && u.multipartIdentifier.size == 1 &&
            u.multipartIdentifier.head.startsWith("graft_cl_") =>
        CorpusLayout.composedServing(session, u.multipartIdentifier.head)
          .getOrElse(u)
    }
  }
}
