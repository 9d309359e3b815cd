package graft.plans

import graft.sources.CorpusLayout
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StructType, StructField, StringType, IntegerType, LongType, BooleanType, TimestampType}

/** SQL surface for the chain-maintenance verbs (SURVEY §2.H) — the last
  * piece of "a SQL-first user manages the corpus lifecycle entirely
  * from SQL". Spark's grammar has no spelling for these (they are table-
  * format verbs, not ANSI SQL), so this is the injectParser tier — the
  * same delegating-parser recipe Delta Lake uses for its VACUUM /
  * OPTIMIZE / DESCRIBE HISTORY:
  *
  * {{{
  *   DESCRIBE HISTORY graft_cl_…                    -- the generation chain
  *   VACUUM graft_cl_… [RETAIN <n> GENERATIONS]     -- MergeOps.vacuum
  *   OPTIMIZE graft_cl_…                            -- MergeOps.compactGenerations
  * }}}
  *
  * Only statements whose target identifier carries the `graft_cl_`
  * prefix are claimed — everything else (including DESCRIBE HISTORY on
  * other tables) delegates to Spark's stock parser verbatim, stock
  * errors included. The commands lower onto the SAME lease-fenced verbs
  * the Scala API uses, so SQL maintenance inherits resync, pin
  * awareness and the single-writer fence; DESCRIBE HISTORY is a pure
  * driver-side listing (generation, files, bytes, served/pinned/dv/
  * mapped flags) — the audit view of the chain, no Spark job.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DescribeHistoryRe(t) => DescribeHistoryCommand(t)
    case VacuumRe(t, _, n) =>
      VacuumLayoutCommand(t, Option(n).map(_.toInt).getOrElse(2))
    case OptimizeRe(t) => OptimizeLayoutCommand(t)
    case CheckTableRe(t) => CheckLayoutCommand(t)
    case CreateTagRe(t, name, _, g) =>
      CreateTagCommand(t, name, Option(g).map(_.toInt).getOrElse(-1))
    case DropTagRe(t, name) => DropTagCommand(t, name)
    case ShowTagsRe(t) => ShowTagsCommand(t)
    case CreateCorpusRe(t, dir, n, pcol, q) =>
      CreateCorpusTableCommand(t, dir, Option(n).map(_.toInt),
        Option(pcol), Option(q))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // anchored, case-insensitive, optional trailing semicolon; the
  // graft_cl_ prefix is part of the match so non-layout statements
  // fall through to the stock parser (and its stock errors)
  private val DescribeHistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(graft_(?:cl|plt)_\w+)\s*;?\s*""".r
  // maintenance verbs cover BOTH layout tiers: the flat graft_cl_
  // tables route to MergeOps/Fsck, partitioned graft_plt_ ones to
  // PartitionedLayout's own vacuum/compact/checkTable
  private val VacuumRe =
    """(?is)\s*VACUUM\s+(graft_(?:cl|plt)_\w+)(\s+RETAIN\s+(\d+)\s+GENERATIONS)?\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+(graft_(?:cl|plt)_\w+)\s*;?\s*""".r
  private val CheckTableRe =
    """(?is)\s*CHECK\s+TABLE\s+(graft_(?:cl|plt)_\w+)\s*;?\s*""".r
  // Iceberg's ref verbs: CREATE/DROP TAG are not in Spark's ALTER
  // grammar, so they must be claimed here; every OTHER ALTER on a
  // layout table falls through to the stock parser and the
  // AlterLayoutRule hint tier
  private val CreateTagRe =
    """(?is)\s*ALTER\s+TABLE\s+(graft_(?:cl|plt)_\w+)\s+CREATE\s+TAG\s+([A-Za-z][A-Za-z0-9_.-]*)(\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""".r
  private val DropTagRe =
    """(?is)\s*ALTER\s+TABLE\s+(graft_(?:cl|plt)_\w+)\s+DROP\s+TAG\s+([A-Za-z][A-Za-z0-9_.-]*)\s*;?\s*""".r
  private val ShowTagsRe =
    """(?is)\s*SHOW\s+TAGS\s+(graft_(?:cl|plt)_\w+)\s*;?\s*""".r
  // table BIRTH from SQL (round 15): the one lifecycle verb that was
  // Scala-only. The target is a LOGICAL keyed-table name (documents /
  // embeddings) — the graft_cl_/graft_plt_ catalog handle is the
  // command's RESULT, not its input, because the hash in those names
  // cannot be written by hand
  private val CreateCorpusRe =
    """(?is)\s*CREATE\s+TABLE\s+(\w+)\s+IN\s+CORPUS\s+'([^']+)'(?:\s+INTO\s+(\d+)\s+BUCKETS)?(?:\s+PARTITIONED\s+BY\s+(\w+))?(?:\s+AS\s+(.+?))?\s*;?\s*""".r

  private[graft] def resolve(spark: SparkSession, tableName: String,
                             verb: String): (String, String) = {
    val (logicalTable, _) = LayoutSql.tableKey(tableName,
      m => throw new IllegalArgumentException(s"$verb $tableName: $m"))
    val (corpusDir, _) = CorpusLayout.corpusForTable(spark, tableName)
      .getOrElse(throw new IllegalStateException(
        s"$verb $tableName: no _CORPUS marker maps this layout table " +
          "back to its corpus under the session's layout base"))
    (corpusDir, logicalTable)
  }

  /** Resolve either layout tier: (corpusDir, table, isPartitioned). */
  private[graft] def resolveAny(spark: SparkSession, tableName: String,
                                verb: String): (String, String, Boolean) =
    if (tableName.startsWith("graft_plt_")) {
      val (corpusDir, table) = graft.sources.PartitionedLayout
        .corpusForTable(spark, tableName)
        .getOrElse(throw new IllegalStateException(
          s"$verb $tableName: no _CORPUS marker maps this partitioned " +
            "layout table back to its corpus under the session's layout base"))
      (corpusDir, table, true)
    } else {
      val (corpusDir, table) = resolve(spark, tableName, verb)
      (corpusDir, table, false)
    }
}

/** `DESCRIBE HISTORY <layout>` — the generation chain as rows. Pure
  * driver-side listing (the same directory walk `generations` does):
  * per generation its file count, byte footprint (hard-linked bytes
  * count in every generation that links them — the inode-dedup'd
  * number is vacuum's concern), and the served / snapshot-pinned /
  * dv-sidecar / column-mapped flags.
  */
case class DescribeHistoryCommand(tableName: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("generation", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("files", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("served", BooleanType, nullable = false),
    StructField("pinned", BooleanType, nullable = false),
    StructField("dv", BooleanType, nullable = false),
    StructField("mapped", BooleanType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.operators.MergeOps
    val (corpusDir, table, partitioned) =
      GraftSqlParser.resolveAny(spark, tableName, "DESCRIBE HISTORY")
    if (partitioned) return runPartitioned(spark, corpusDir, table)
    val servedLoc = CorpusLayout.ifPresent(spark, corpusDir, table)
      .flatMap(_ => CorpusLayout.servedGeneration(spark, corpusDir, table))
      .map(p => java.nio.file.Paths.get(p).normalize.toString)
    val pins = MergeOps.pins(spark, corpusDir, table)
    MergeOps.generations(spark, corpusDir, table).map { case (g, p) =>
      val dir = new java.io.File(p)
      val data = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      val norm = java.nio.file.Paths.get(p).normalize.toString
      Row(g, p, new java.sql.Timestamp(CorpusLayout.commitTsOf(p)),
        data.length, data.map(_.length).sum,
        servedLoc.contains(norm), pins.contains(norm),
        CorpusLayout.hasDv(p), CorpusLayout.readMapping(p).nonEmpty)
    }
  }

  /** The partitioned chain's history: same row shape — files/bytes walk
    * the partition subdirs, dv = any per-partition sidecar, pinned =
    * tag-pinned (partitioned chains have their own tag namespace),
    * mapped = a `_MAPPING` marker on the generation.
    */
  private def runPartitioned(spark: SparkSession, corpusDir: String,
                             table: String): Seq[Row] = {
    import graft.sources.PartitionedLayout
    val servedLoc = scala.util.Try(graft.operators.MergeOps.tableLayout(
        spark, PartitionedLayout.tableName(table, corpusDir))._1)
      .toOption.map(p => java.nio.file.Paths.get(p).normalize.toString)
    val pinnedGens = PartitionedLayout.tags(spark, corpusDir, table)
      .values.toSet
    PartitionedLayout.generations(spark, corpusDir, table).map { case (g, p) =>
      val base = java.nio.file.Paths.get(p)
      val walk = java.nio.file.Files.walk(base)
      val data = try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(f => java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size(_)).toVector
      } finally walk.close()
      val norm = java.nio.file.Paths.get(p).normalize.toString
      Row(g, p, new java.sql.Timestamp(CorpusLayout.commitTsOf(p)),
        data.length, data.sum,
        servedLoc.contains(norm), pinnedGens.contains(g),
        PartitionedLayout.dvParts(p).nonEmpty,
        CorpusLayout.readMapping(p).nonEmpty)
    }
  }
}

/** `VACUUM <layout> [RETAIN n GENERATIONS]` — [[graft.operators.MergeOps.vacuum]]
  * through SQL: reclaims drained, unpinned, non-served generations,
  * returning the deleted paths.
  */
case class VacuumLayoutCommand(tableName: String, keepLast: Int)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("deleted_path", StringType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val (corpusDir, table, partitioned) =
      GraftSqlParser.resolveAny(spark, tableName, "VACUUM")
    (if (partitioned)
       graft.sources.PartitionedLayout.vacuum(spark, corpusDir, table, keepLast)
     else graft.operators.MergeOps.vacuum(spark, corpusDir, table, keepLast))
      .map(Row(_))
  }
}

/** `OPTIMIZE <layout>` — [[graft.operators.MergeOps.compactGenerations]]
  * through SQL: folds the trickle chain (and any MOR sidecar) into one
  * fresh no-shared-inode generation, returning its path.
  */
case class OptimizeLayoutCommand(tableName: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("new_generation", StringType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val (corpusDir, table, partitioned) =
      GraftSqlParser.resolveAny(spark, tableName, "OPTIMIZE")
    Seq(Row(
      if (partitioned)
        graft.sources.PartitionedLayout.compact(spark, corpusDir, table)
      else graft.operators.MergeOps.compactGenerations(spark, corpusDir, table)))
  }
}

/** `ALTER TABLE <layout> CREATE TAG <name> [AS OF VERSION n]` —
  * [[graft.operators.MergeOps.tagGeneration]]: a named generation ref
  * (Iceberg's tag shape). Tagged generations survive VACUUM; `VERSION
  * AS OF '<name>'` reads them.
  */
case class CreateTagCommand(tableName: String, tag: String,
                            generation: Int) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("tagged_generation", StringType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val (corpusDir, table, partitioned) =
      GraftSqlParser.resolveAny(spark, tableName, "CREATE TAG")
    Seq(Row(
      if (partitioned) graft.sources.PartitionedLayout.tagGeneration(
        spark, corpusDir, table, tag, generation)
      else graft.operators.MergeOps.tagGeneration(
        spark, corpusDir, table, tag, generation)))
  }
}

/** `ALTER TABLE <layout> DROP TAG <name>` — releases the pin; the bytes
  * reclaim at the next VACUUM.
  */
case class DropTagCommand(tableName: String, tag: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("existed", BooleanType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val (corpusDir, table, partitioned) =
      GraftSqlParser.resolveAny(spark, tableName, "DROP TAG")
    Seq(Row(
      if (partitioned)
        graft.sources.PartitionedLayout.dropTag(spark, corpusDir, table, tag)
      else graft.operators.MergeOps.dropTag(spark, corpusDir, table, tag)))
  }
}

/** `SHOW TAGS <layout>` — name → generation of every retained tag. */
case class ShowTagsCommand(tableName: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("generation", IntegerType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val (corpusDir, table, partitioned) =
      GraftSqlParser.resolveAny(spark, tableName, "SHOW TAGS")
    (if (partitioned)
       graft.sources.PartitionedLayout.tags(spark, corpusDir, table)
     else graft.operators.MergeOps.tags(spark, corpusDir, table))
      .toSeq.sorted.map { case (n, g) => Row(n, g) }
  }
}

/** `CHECK TABLE <layout>` — [[graft.operators.Fsck.checkTable]] through
  * SQL: audit the served generation's physical invariants (markers,
  * mapping, file naming, bucket placement, key uniqueness, manifest
  * soundness, dv sidecar) as (check, status, details) rows.
  */
case class CheckLayoutCommand(tableName: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("check", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("details", StringType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val (corpusDir, table, partitioned) =
      GraftSqlParser.resolveAny(spark, tableName, "CHECK TABLE")
    (if (partitioned)
       graft.sources.PartitionedLayout.checkTable(spark, corpusDir, table)
     else graft.operators.Fsck.checkTable(spark, corpusDir, table))
      .map(f => Row(f.check, f.status, f.details))
  }
}

/** `CREATE TABLE <table> IN CORPUS '<dir>' [INTO n BUCKETS]
  * [PARTITIONED BY pcol] [AS <query>]` — table birth from SQL, closing
  * the last Scala-only lifecycle verb: a SQL-first user could MERGE,
  * UPDATE, time-travel, OPTIMIZE and VACUUM a served table but never
  * CREATE one. With AS, the query result is key-validated (unique,
  * non-NULL — the row-identity law every apply enforces, moved to
  * birth) and written as the corpus file `<dir>/<table>.parquet` with
  * errorifexists semantics (re-birthing over an existing corpus file
  * must be an explicit delete, never an accident); then the flat
  * [[graft.sources.CorpusLayout.materialize]] — or, with PARTITIONED
  * BY, [[graft.sources.PartitionedLayout.materialize]] — builds and
  * registers the served layout. Returns the catalog table name: the
  * handle every other SQL verb speaks. The validation snapshot
  * (localCheckpoint) is MergeOps' changeset discipline — the gate and
  * the write must see the SAME rows even off a non-deterministic query.
  */
case class CreateCorpusTableCommand(table: String, corpusDir: String,
                                    buckets: Option[Int],
                                    pcol: Option[String],
                                    query: Option[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(StructType(Seq(
    StructField("created_table", StringType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val key = CorpusLayout.keyed.getOrElse(table,
      throw new IllegalArgumentException(
        s"CREATE TABLE $table: not a keyed layout table — known tables: " +
          CorpusLayout.keyed.keys.toSeq.sorted.mkString(", ")))
    query.foreach { q =>
      val df = spark.sql(q).localCheckpoint(true)
      require(df.columns.contains(key),
        s"CREATE TABLE $table AS: query result carries no key column '$key'")
      val bad = df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col(key).isNull || col("__n") > 1).limit(5).collect()
      require(bad.isEmpty,
        s"CREATE TABLE $table AS: key '$key' must be unique and non-NULL " +
          s"(the layout's row-identity law, enforced at birth): " +
          bad.mkString(", "))
      df.write.mode("errorifexists").parquet(s"$corpusDir/$table.parquet")
    }
    val b = buckets.getOrElse(CorpusLayout.DefaultBuckets)
    val t = pcol match {
      case Some(pc) => graft.sources.PartitionedLayout
        .materialize(spark, corpusDir, table, pc, b)
      case None => CorpusLayout.materialize(spark, corpusDir,
        buckets = b, tables = Seq(table)).head
    }
    Seq(Row(t))
  }
}
