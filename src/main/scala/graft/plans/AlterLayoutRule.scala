package graft.plans

import graft.sources.CorpusLayout
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFieldName, UnresolvedTable}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.DataType

/** SQL surface for schema evolution over a served corpus layout
  * (SURVEY §2.I): `ALTER TABLE <graft_cl_…> ADD COLUMNS / RENAME COLUMN
  * / DROP COLUMN` lower onto the metadata-only evolution verbs —
  * [[graft.operators.MergeOps.renameColumn]] / `dropColumn` (the
  * `_MAPPING` swing: every byte hard-links) and, for ADD, an EMPTY
  * evolving changeset through `applyToLayout(evolveSchema = true)` (the
  * union-schema adoption path: zero rows touch zero buckets, so the new
  * generation hard-links every file and untouched rows read the column
  * as NULL — the Delta/Iceberg metadata-only ADD COLUMN).
  *
  * Placement is the [[TimeTravelLayoutRule]] recipe, NOT
  * [[MergeIntoLayoutRule]]'s: Spark's `ResolveSessionCatalog` throws
  * UNSUPPORTED_FEATURE for v1 ALTER … COLUMN in the SAME resolution
  * pass that resolves the table, BEFORE injected resolution rules run —
  * the hint batch precedes Resolution entirely, and this rewrite needs
  * nothing resolved (it matches the table by NAME; a name that is not a
  * served layout keeps Spark's stock path and its stock error).
  *
  * Loud limits: single-part (non-nested) names only; the layout key can
  * be neither renamed nor dropped (row identity); added columns must be
  * nullable with no DEFAULT and no position (untouched rows read NULL —
  * a NOT NULL or defaulted column would lie about unrewritten files).
  */
class AlterLayoutRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ALTER TABLE <graft layout table>: $msg")

  private def layoutName(p: LogicalPlan): Option[String] = p match {
    case u: UnresolvedTable
        if u.multipartIdentifier.size == 1 &&
          u.multipartIdentifier.head.startsWith("graft_cl_") &&
          CorpusLayout.corpusForTable(session, u.multipartIdentifier.head).isDefined =>
      Some(u.multipartIdentifier.head)
    case u: UnresolvedTable
        if u.multipartIdentifier.size == 1 &&
          u.multipartIdentifier.head.startsWith("graft_plt_") &&
          graft.sources.PartitionedLayout
            .corpusForTable(session, u.multipartIdentifier.head).isDefined =>
      Some(u.multipartIdentifier.head)
    case _ => None
  }

  private def onePart(f: org.apache.spark.sql.catalyst.analysis.FieldName): String =
    f match {
      case UnresolvedFieldName(Seq(n)) => n
      case other => fail(s"nested fields are not supported, got $other")
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r @ RenameColumn(t, col, newName) =>
      layoutName(t).map(n =>
        AlterLayoutCommand(n, AlterLayoutCommand.Rename(onePart(col), newName))
          : LogicalPlan).getOrElse(r)
    case d @ DropColumns(t, cols, ifExists) =>
      layoutName(t).map(n =>
        AlterLayoutCommand(n,
          AlterLayoutCommand.Drop(cols.map(onePart), ifExists)): LogicalPlan)
        .getOrElse(d)
    case a @ AddColumns(t, cols) =>
      layoutName(t).map { n =>
        val adds = cols.map { c =>
          if (c.path.isDefined) fail(
            s"nested ADD COLUMNS is not supported, got ${c.name.mkString(".")}")
          if (c.position.isDefined) fail(
            "FIRST/AFTER is not supported — layout columns are unordered " +
              "metadata")
          if (c.default.isDefined) fail(
            "DEFAULT is not supported — untouched rows read an added " +
              "column as NULL")
          if (!c.nullable) fail(
            "added columns must be nullable — untouched files are " +
              "hard-linked, their rows read NULL")
          c.colName -> c.dataType
        }
        AlterLayoutCommand(n, AlterLayoutCommand.Add(adds)): LogicalPlan
      }.getOrElse(a)
  }
}

object AlterLayoutCommand {
  sealed trait Action
  final case class Rename(from: String, to: String) extends Action
  final case class Drop(cols: Seq[String], ifExists: Boolean) extends Action
  final case class Add(cols: Seq[(String, DataType)]) extends Action
}

/** The runnable command [[AlterLayoutRule]] lowers ALTER TABLE onto. */
case class AlterLayoutCommand(tableName: String,
                              action: AlterLayoutCommand.Action)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions._
    import graft.operators.MergeOps
    val f = (msg: String) => throw new IllegalArgumentException(
      s"ALTER TABLE $tableName: $msg")
    val (logicalTable, keyCol) = LayoutSql.tableKey(tableName,
      m => throw new IllegalArgumentException(s"ALTER TABLE $tableName: $m"))
    val (corpusDir, tgt) =
      LayoutSql.servedTarget(spark, tableName, logicalTable, "ALTER TABLE")
    val partitioned = LayoutSql.isPartitioned(tableName)
    action match {
      case AlterLayoutCommand.Rename(from, to) =>
        if (partitioned) graft.sources.PartitionedLayout
          .renameColumn(spark, corpusDir, logicalTable, from, to)
        else MergeOps.renameColumn(spark, corpusDir, logicalTable, from, to)
      case AlterLayoutCommand.Drop(cols, ifExists) =>
        cols.foreach { c =>
          if (!ifExists || tgt.columns.contains(c)) {
            if (partitioned) graft.sources.PartitionedLayout
              .dropColumn(spark, corpusDir, logicalTable, c)
            else MergeOps.dropColumn(spark, corpusDir, logicalTable, c)
          }
        }
      case AlterLayoutCommand.Add(cols) =>
        if (partitioned) graft.sources.PartitionedLayout
          .addColumns(spark, corpusDir, logicalTable, cols)
        else MergeOps.addColumns(spark, corpusDir, logicalTable, cols)
    }
    Seq.empty
  }
}
