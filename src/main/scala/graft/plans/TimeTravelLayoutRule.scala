package graft.plans

import graft.sources.CorpusLayout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL surface for generation time travel (SURVEY §2.I): `SELECT …
  * FROM <layout table> VERSION AS OF n` resolves to
  * [[graft.operators.MergeOps.readGeneration]]'s frame — the SAME
  * composed view the generation served (dv sidecar + column mapping,
  * manifest-pruned scan), so a SQL-first user audits or reproduces any
  * retained generation without the Scala API. Spark's stock parser
  * already yields `RelationTimeTravel` and its analyzer rejects v1
  * tables; this rule (the [[MergeIntoLayoutRule]] recipe one tier
  * down — a relation, not a command) claims the node when the relation
  * is a `graft_cl_` layout table, leaving every other target on
  * Spark's stock behavior.
  *
  * `TIMESTAMP AS OF` fails loudly: generations are numbered, not
  * timestamped — the snapshot verb ([[graft.operators.MergeOps.snapshot]])
  * is the moment-pinning surface. A vacuumed or unknown generation
  * fails with readGeneration's have-list. The rewrite embeds the
  * resolved generation frame's ANALYZED plan, so everything above
  * (filters, projections) re-resolves against it and pushdown reaches
  * the manifest index exactly as on the live table.
  */
class TimeTravelLayoutRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version)
        if u.multipartIdentifier.size == 1 &&
          u.multipartIdentifier.head.startsWith("graft_cl_") =>
      val name = u.multipartIdentifier.head
      CorpusLayout.corpusForTable(session, name) match {
        case None => tt // no marker maps it — keep Spark's stock path
        case Some((corpusDir, table)) =>
          if (ts.nonEmpty) throw new IllegalArgumentException(
            s"TIMESTAMP AS OF is not supported on layout table $name — " +
              "generations are numbered (VERSION AS OF n); pin moments " +
              "with MergeOps.snapshot")
          val gen = version.getOrElse(throw new IllegalArgumentException(
            s"time travel on $name needs VERSION AS OF <generation | 'tag'>"))
          // an integer reads that generation; anything else resolves as
          // a TAG (MergeOps.tagGeneration — Iceberg's `VERSION AS OF
          // 'ref'` spelling), failing with the available names
          val n = try gen.toInt catch {
            case _: NumberFormatException =>
              val tags = graft.operators.MergeOps.tags(session, corpusDir, table)
              tags.getOrElse(gen, throw new IllegalArgumentException(
                s"VERSION AS OF on $name: '$gen' is neither an integer " +
                  s"generation nor a retained tag — tags: " +
                  s"${tags.keys.toSeq.sorted.mkString(", ")}"))
          }
          graft.operators.MergeOps.readGeneration(session, corpusDir, table, n)
            .queryExecution.analyzed
      }
  }
}
