package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the extractor registry
  * (`spark.read.format("graft-registry").option("table", "usages")`).
  *
  * The reference consumes the registry by HTTP GET per file
  * (/root/reference/marda_extractors_api/__init__.py:96-123); Spark-first,
  * the registry is a TABLE a catalog/service exposes once per query. This
  * connector is the service-backed form of the in-memory dims in
  * [[graft.registry.Registry]]: same rows, same schemas, but arriving
  * through the V2 read path — planning (schema, column pruning) happens on
  * the driver, row production inside the scan, so a real registry service
  * drops in by replacing [[RegistryData]] with its client without touching
  * any query.
  *
  * Column pruning is wired through [[SupportsPushDownRequiredColumns]]:
  * `SELECT extractor_id FROM ...` materializes 1-field rows, which is the
  * difference between shipping a row and shipping a payload when the
  * backing service returns wide documents. A single [[InputPartition]] is
  * correct here (the registry is dim-sized and broadcasts downstream);
  * a partitioned backend would return one partition per shard instead.
  */
class RegistrySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-registry"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RegistryData.schemaOf(RegistryData.tableName(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RegistryTable(RegistryData.tableName(new CaseInsensitiveStringMap(properties)))
}

/** The registry CLIENT seam: one implementation per backing service.
  * Everything downstream — the DSv2 connector, [[graft.registry.Registry]]'s
  * broadcast dims, and therefore every r01–r14 query — consumes registry
  * rows through [[RegistryData]], which delegates here. A real deployment
  * installs its client once at startup ([[RegistryData.setBackend]]); the
  * reference's HTTP JSON client maps 1:1 (GET /filetypes → `filetypes`,
  * GET /extractors/{id} usage/installation blocks → `usages` /
  * `installations`). RegistrySeamSpec swaps a JSON-fixture client and
  * pins that the connector AND the whole query pack track it with zero
  * query changes.
  *
  * Rows are plain Scala values positionally matching
  * [[RegistryData.schemas]].
  */
trait RegistryBackend {
  def rows(table: String): Seq[Seq[Any]]
}

/** The built-in fixture backend (the reference's test registry). */
object BuiltinRegistryBackend extends RegistryBackend {
  def rows(table: String): Seq[Seq[Any]] = table match {
    case "filetypes" => Seq(
      Seq("biologic-mpr", Seq("yadg", "galvani")),
      Seq("example-xy", Seq("yadg")),
      Seq("nexus-hdf5", Seq("h5grove")),
      Seq("pdf", Seq("pdfplumber-cli")),
      Seq("csv", Seq.empty[String]))
    case "usages" => Seq(
      Seq("yadg", 0, "python", "yadg", "yadg.extractors.extract({{ input_type }}, {{ input_path }})"),
      Seq("yadg", 1, "cli", "", "yadg extract {{ input_type }} {{ input_path }} --out {{ output_path }} --fmt {{ output_type }}"),
      Seq("galvani", 0, "python", "galvani", "galvani.MPRfile({{ input_path }})"),
      Seq("h5grove", 0, "cli", "", "h5dump {{ input_path }} > {{ output_path }}"),
      Seq("pdfplumber-cli", 0, "cli", "", "pdfplumber {{ input_path }} --out {{ output_path }}"))
    case "installations" => Seq(
      Seq("yadg", "pip", "yadg~=5.0"),
      Seq("galvani", "pip", "galvani>=0.4"),
      Seq("h5grove", "pip", "h5grove"),
      Seq("pdfplumber-cli", "pip", "pdfplumber"))
  }
}

/** Registry rows shared by the connector and (via
  * [[graft.registry.Registry]]'s Dataset builders) the in-memory dims —
  * served through the swappable [[RegistryBackend]].
  */
object RegistryData {
  @volatile private var backend: RegistryBackend = BuiltinRegistryBackend

  /** Install a registry client (deployment: once at startup). */
  def setBackend(b: RegistryBackend): Unit = { backend = b }

  /** Run `f` against a different backend, restoring the previous one —
    * the test seam (and the honest shape of "swaps in without touching
    * any query": only this call changes, every plan re-derives).
    */
  def withBackend[T](b: RegistryBackend)(f: => T): T = {
    val prev = backend
    backend = b
    try f finally { backend = prev }
  }

  def tableName(options: CaseInsensitiveStringMap): String = {
    val t = options.getOrDefault("table", "usages")
    require(schemas.contains(t), s"unknown registry table '$t' (have: ${schemas.keys.mkString(", ")})")
    t
  }

  val schemas: Map[String, StructType] = Map(
    "filetypes" -> StructType(Seq(
      StructField("filetype_id", StringType, nullable = false),
      StructField("registered_extractors", ArrayType(StringType, containsNull = false), nullable = false))),
    "usages" -> StructType(Seq(
      StructField("extractor_id", StringType, nullable = false),
      StructField("idx", IntegerType, nullable = false),
      StructField("method", StringType, nullable = false),
      StructField("setup", StringType, nullable = false),
      StructField("command", StringType, nullable = false))),
    "installations" -> StructType(Seq(
      StructField("extractor_id", StringType, nullable = false),
      StructField("method", StringType, nullable = false),
      StructField("package", StringType, nullable = false))))

  def schemaOf(table: String): StructType = schemas(table)

  /** Rows as plain Scala values, positionally matching the schemas —
    * whatever the installed backend serves.
    */
  def rows(table: String): Seq[Seq[Any]] = {
    require(schemas.contains(table), s"unknown registry table '$table'")
    backend.rows(table)
  }
}

private[sources] class RegistryTable(table: String) extends Table with SupportsRead {
  override def name(): String = s"graft_registry_$table"
  override def schema(): StructType = RegistryData.schemaOf(table)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RegistryScanBuilder(table)
}

/** Predicate pushdown ([[SupportsPushDownFilters]]): the filters a real
  * registry SERVICE could evaluate server-side — equality / IN / not-null
  * on atomic columns (`filetype = 'pdf'`, `method IN ('cli','python')`) —
  * are accepted and evaluated inside the scan, so the client never
  * receives the rows at all; anything richer is returned as residual and
  * Spark keeps its post-scan Filter. Accepted filters surface in the scan
  * description (`filters=[...]`, the DSv2 analog of parquet's
  * PushedFilters — spec-pinned) and are REMOVED from the post-scan plan
  * by V2ScanRelationPushDown, so the source is authoritative for them.
  */
private[sources] class RegistryScanBuilder(table: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = RegistryData.schemaOf(table)
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def atomic(col: String): Boolean =
    RegistryData.schemaOf(table).fields
      .exists(f => f.name == col && !f.dataType.isInstanceOf[ArrayType])

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => atomic(a)
    case In(a, _)      => atomic(a)
    case IsNotNull(a)  => atomic(a)
    case _             => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, residual) = filters.partition(supported)
    pushed = take
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new RegistryScan(table, required, pushed)
}

private[sources] class RegistryScan(table: String, required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftRegistryScan(table=$table, columns=[${required.fieldNames.mkString(", ")}]" +
      s", filters=[${filters.mkString(", ")}])"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(RegistryPartition(table, required.fieldNames, filters))
  override def createReaderFactory(): PartitionReaderFactory = RegistryReaderFactory
}

private[sources] case class RegistryPartition(table: String, columns: Array[String],
    filters: Array[org.apache.spark.sql.sources.Filter]) extends InputPartition

private[sources] object RegistryReaderFactory extends PartitionReaderFactory {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}

  /** Evaluate an accepted filter against the raw (pre-conversion) row —
    * what the backing service would do server-side.
    */
  private def eval(f: Filter, row: Seq[Any], full: StructType): Boolean = f match {
    case EqualTo(a, v) => row(full.fieldIndex(a)) == v
    case In(a, vs)     => vs.contains(row(full.fieldIndex(a)))
    case IsNotNull(a)  => row(full.fieldIndex(a)) != null
    case other => throw new IllegalStateException(
      s"unexpected pushed filter $other — RegistryScanBuilder.supported out of sync")
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RegistryPartition]
    val full = RegistryData.schemaOf(p.table)
    val indices = p.columns.map(full.fieldIndex)
    val rows = RegistryData.rows(p.table).iterator
      .filter(r => p.filters.forall(eval(_, r, full)))
    new PartitionReader[InternalRow] {
      private var current: Seq[Any] = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
      override def get(): InternalRow =
        InternalRow.fromSeq(indices.toIndexedSeq.map(i => convert(current(i))))
      override def close(): Unit = ()
    }
  }

  private def convert(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case xs: Seq[_] => ArrayData.toArrayData(xs.map(convert).toArray)
    case other => other
  }
}
