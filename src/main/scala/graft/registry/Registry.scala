package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's registry data model, as Spark dimension tables.
  *
  * The reference fetches JSON from a remote registry
  * (`/root/reference/marda_extractors_api/__init__.py:96-123`:
  * GET /filetypes/{id} → registered_extractors, GET /extractors/{id} →
  * usage/installation blocks). Re-expressed Spark-first, the registry is a
  * set of small dimension tables that broadcast to every executor — at
  * 100 TB of files the registry stays a few KB, so file→extractor matching
  * is a map-side broadcast join, never a shuffle of the file catalog.
  *
  * The rows mirror the reference's test fixture
  * (`/root/reference/tests/test_mpr.py:77-95`: the `yadg` extractor
  * definition) plus representative entries exercising every dispatch path
  * (multi-extractor filetype, cli-only, python-only, no-extractor).
  */
object Registry {

  /** Dim frames build from [[graft.sources.RegistryData]] — the same
    * swappable [[graft.sources.RegistryBackend]] the DSv2 connector
    * serves, so installing a real registry client retargets EVERY r-query
    * with zero query changes (RegistrySeamSpec pins this). The `*Sql`
    * VALUES mirrors below stay literal: they mirror the BUILT-IN backend,
    * which is what the driver's oracle gate always runs against.
    */
  private def fromRegistry(s: SparkSession, table: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[org.apache.spark.sql.Row] =
      graft.sources.RegistryData.rows(table)
        .map(r => org.apache.spark.sql.Row.fromSeq(r)).asJava
    s.createDataFrame(rows, graft.sources.RegistryData.schemaOf(table))
  }

  /** filetype → ordered registered extractors (order = registry rank; the
    * reference picks index 0, `__init__.py:110-115`).
    */
  def filetypes(s: SparkSession): DataFrame = fromRegistry(s, "filetypes")

  /** DuckDB VALUES mirror of [[filetypes]] (oracle side). */
  val filetypesSql: String = """
    (SELECT * FROM (VALUES
       ('biologic-mpr', ['yadg', 'galvani']),
       ('example-xy',   ['yadg']),
       ('nexus-hdf5',   ['h5grove']),
       ('pdf',          ['pdfplumber-cli']),
       ('csv',          []::VARCHAR[])
     ) AS t(filetype_id, registered_extractors))"""

  /** Usage blocks: (extractor, idx, method, setup, command) — idx is the
    * JSON array position `parse_usage` iterates (`__init__.py:443-456`).
    */
  def usages(s: SparkSession): DataFrame = fromRegistry(s, "usages")

  /** DuckDB VALUES mirror of [[usages]]. */
  val usagesSql: String = """
    (SELECT * FROM (VALUES
       ('yadg', 0, 'python', 'yadg', 'yadg.extractors.extract({{ input_type }}, {{ input_path }})'),
       ('yadg', 1, 'cli', '', 'yadg extract {{ input_type }} {{ input_path }} --out {{ output_path }} --fmt {{ output_type }}'),
       ('galvani', 0, 'python', 'galvani', 'galvani.MPRfile({{ input_path }})'),
       ('h5grove', 0, 'cli', '', 'h5dump {{ input_path }} > {{ output_path }}'),
       ('pdfplumber-cli', 0, 'cli', '', 'pdfplumber {{ input_path }} --out {{ output_path }}')
     ) AS t(extractor_id, idx, method, setup, command))"""

  /** Per-(extractor, filetype) template overrides: the reference merges a
    * supported-filetype's `template` dict OVER the default fields before
    * substitution (`__init__.py:236-243` selects it, `:429-441` applies it
    * via `additional_template.get(field) or default`). Pre-pivoted to one
    * nullable column per overridable field; null = no override.
    */
  def templates(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      // yadg handles example-xy under its registry type name and forces
      // netcdf output regardless of what the caller asked for
      ("yadg", "example-xy", Some("marda:example-xy"), Option.empty[String], Some("netcdf"), Option.empty[String]),
      // h5grove dumps every nexus file to a fixed staging path
      ("h5grove", "nexus-hdf5", Option.empty[String], Option.empty[String], Option.empty[String], Some("/scratch/nexus/dump.json"))
    ).toDF("extractor_id", "filetype_id",
      "t_input_type", "t_input_path", "t_output_type", "t_output_path")
  }

  /** DuckDB VALUES mirror of [[templates]]. */
  val templatesSql: String = """
    (SELECT * FROM (VALUES
       ('yadg', 'example-xy', 'marda:example-xy', NULL, 'netcdf', NULL),
       ('h5grove', 'nexus-hdf5', NULL, NULL, NULL, '/scratch/nexus/dump.json')
     ) AS t(extractor_id, filetype_id, t_input_type, t_input_path, t_output_type, t_output_path))"""

  /** Installation instructions (`MardaExtractor.install`,
    * `__init__.py:179-217`): pip packages per extractor.
    */
  def installations(s: SparkSession): DataFrame = fromRegistry(s, "installations")

  /** DuckDB VALUES mirror of [[installations]]. */
  val installationsSql: String = """
    (SELECT * FROM (VALUES
       ('yadg', 'pip', 'yadg~=5.0'),
       ('galvani', 'pip', 'galvani>=0.4'),
       ('h5grove', 'pip', 'h5grove'),
       ('pdfplumber-cli', 'pip', 'pdfplumber')
     ) AS t(extractor_id, method, package))"""
}
