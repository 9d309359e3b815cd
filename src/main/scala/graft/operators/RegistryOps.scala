package graft.operators

import graft.{GQuery, Tables}
import graft.GQuery._
import graft.registry.Registry
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's own surface, Spark-first (SURVEY.md §2.B).
  *
  * `extract(input_path, input_type)` in the reference
  * (`/root/reference/marda_extractors_api/__init__.py:45-148`) is, as
  * dataflow: file catalog ⋈ registry → pick extractor[0] → resolve usage by
  * preferred mode → template the command → execute per file. Here every
  * step is a declarative plan over broadcast registry dims, so the same
  * pipeline runs unchanged over 10 files or 10^10: the file catalog is the
  * only big table and it streams map-side through every stage.
  *
  * The file catalog derives deterministically from `documents` (id → path +
  * filetype + preferred mode) so the DuckDB oracle reproduces it.
  */
object RegistryOps {

  /** File catalog columns over documents: path, filetype, preferred mode,
    * and the caller-requested output_type (null = unspecified, like the
    * reference's `output_type=None` default — its placeholder then stays
    * un-substituted).
    */
  private def catalog(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.load(s, d, "documents").select(
      $"doc_id",
      concat(lit("/data/files/doc_"), $"doc_id", lit("."),
        element_at(array(lit("mpr"), lit("xy"), lit("h5"), lit("csv")), ($"doc_id" % 4 + 1).cast(IntegerType))).as("input_path"),
      element_at(array(lit("biologic-mpr"), lit("example-xy"), lit("nexus-hdf5"), lit("csv")),
        ($"doc_id" % 4 + 1).cast(IntegerType)).as("filetype_id"),
      // mode varies on a modulus coprime to the filetype's so every
      // (filetype, mode) pair occurs — the mode-2 variant never exercised
      // the cli path of %4-aligned filetypes, hiding the None-skip
      // templating branch entirely
      when($"doc_id" % 3 === 0, "python").otherwise("cli").as("preferred_mode"),
      when($"doc_id" % 5 === 0, "json-ld").otherwise(lit(null).cast(StringType)).as("output_type"))
  }

  private val catalogSql: String = """
    (SELECT doc_id,
            '/data/files/doc_' || doc_id || '.' ||
              (['mpr','xy','h5','csv'])[CAST(doc_id % 4 + 1 AS INT)] AS input_path,
            (['biologic-mpr','example-xy','nexus-hdf5','csv'])[CAST(doc_id % 4 + 1 AS INT)] AS filetype_id,
            CASE WHEN doc_id % 3 = 0 THEN 'python' ELSE 'cli' END AS preferred_mode,
            CASE WHEN doc_id % 5 = 0 THEN 'json-ld' END AS output_type
     FROM documents)"""

  /** apply_template_args (`__init__.py:401-441`), column form: substitute
    * each `{{ field }}` with its override-merged value — python mode
    * repr-quotes, cli substitutes raw — and leave the placeholder in place
    * when the merged value is null (the reference `continue`s on None).
    * The merge itself (`additional_template.get(field) or default`,
    * `__init__.py:429-433`) is the caller's coalesce in `fields`.
    */
  private def applyTemplate(cmd: Column, method: Column,
                            fields: Seq[(String, Column)]): Column =
    fields.foldLeft(cmd) { case (c, (f, v)) =>
      when(v.isNull, c).otherwise(replace(c, lit(s"{{ $f }}"),
        when(method === "python", concat(lit("'"), v, lit("'"))).otherwise(v)))
    }

  /** The four default template fields with per-filetype overrides merged
    * over them; expects columns filetype_id, input_path, output_type and
    * the t_* override columns of [[Registry.templates]] in scope.
    */
  private def defaultFields(s: SparkSession): Seq[(String, Column)] = {
    import s.implicits._
    Seq(
      "input_type" -> coalesce($"t_input_type", $"filetype_id"),
      "input_path" -> coalesce($"t_input_path", $"input_path"),
      "output_type" -> coalesce($"t_output_type", $"output_type"),
      "output_path" -> coalesce($"t_output_path",
        regexp_replace($"input_path", "\\.[a-z0-9]+$", ".json")))
  }

  /** DuckDB mirror of one [[applyTemplate]] fold step. */
  private def tmplFieldSql(cmd: String, field: String, value: String): String =
    s"""(CASE WHEN $value IS NULL THEN $cmd
         ELSE replace($cmd, '{{ $field }}',
           CASE WHEN method = 'python' THEN chr(39) || $value || chr(39) ELSE $value END) END)"""

  /** DuckDB mirror of the full 4-field template chain over a CTE exposing
    * method, command, filetype_id, input_path, output_type, t_*.
    */
  private def applyTemplateSql(cmd: String): String = {
    val f1 = tmplFieldSql(cmd, "input_type", "COALESCE(t_input_type, filetype_id)")
    val f2 = tmplFieldSql(f1, "input_path", "COALESCE(t_input_path, input_path)")
    val f3 = tmplFieldSql(f2, "output_type", "COALESCE(t_output_type, output_type)")
    tmplFieldSql(f3, "output_path",
      "COALESCE(t_output_path, regexp_replace(input_path, '\\.[a-z0-9]+$', '.json'))")
  }

  /** Shared resolved-usage CTE chain (r04/r05 oracles). */
  private val resolvedSqlCtes: String = s"""
        u AS (SELECT * FROM ${Registry.usagesSql}),
        rs AS (
          SELECT extractor_id, m.preferred_mode,
                 max(CASE WHEN method = m.preferred_mode THEN 1 ELSE 0 END) AS has_pref,
                 min(CASE WHEN method = m.preferred_mode THEN idx END) AS pref_idx,
                 max(idx) AS last_idx
          FROM u, (SELECT unnest(['python', 'cli']) AS preferred_mode) m
          GROUP BY extractor_id, m.preferred_mode),
        resolved AS (
          SELECT rs.extractor_id, rs.preferred_mode, u.method, u.command
          FROM rs JOIN u ON rs.extractor_id = u.extractor_id
                 AND u.idx = (CASE WHEN rs.has_pref = 1 THEN rs.pref_idx ELSE rs.last_idx END))"""

  /** parse_usage semantics (__init__.py:443-456) for both preferred modes:
    * (extractor_id, preferred_mode, method, command) — first usage matching
    * the preferred mode, else the LAST usage block. Shared by r03 and r05.
    */
  private def resolvedUsages(s: SparkSession): DataFrame = {
    import s.implicits._
    val u = Registry.usages(s)
    u.join(s.createDataFrame(Seq(Tuple1("python"), Tuple1("cli"))).toDF("preferred_mode"))
      .withColumn("is_pref", ($"method" === $"preferred_mode").cast(IntegerType))
      .groupBy($"extractor_id", $"preferred_mode")
      .agg(max($"is_pref").as("has_pref"),
        min(when($"is_pref" === 1, $"idx")).as("pref_idx"), max($"idx").as("last_idx"))
      .withColumn("use_idx", when($"has_pref" === 1, $"pref_idx").otherwise($"last_idx"))
      .join(u.select($"extractor_id", $"idx", $"method", $"command"), Seq("extractor_id"))
      .filter($"idx" === $"use_idx")
      .select($"extractor_id", $"preferred_mode", $"method", $"command")
  }

  val all: Seq[GQuery] = Seq(

    // ── r01: normalize the registry — filetype × ranked extractors ──
    // (the JSON `registered_extractors` array → relational rows).
    GQuery("r01_registry_explode",
      (s, d) => {
        import s.implicits._
        Registry.filetypes(s)
          .select($"filetype_id", posexplode($"registered_extractors"))
          .select($"filetype_id", ($"pos" + 1).cast(IntegerType).as("rank"), $"col".as("extractor_id"))
          .orderBy($"filetype_id", $"rank")
      },
      Some(s"""
        SELECT filetype_id,
               CAST(unnest(range(1, len(registered_extractors) + 1)) AS INT) AS rank,
               unnest(registered_extractors) AS extractor_id
        FROM ${Registry.filetypesSql}
        ORDER BY filetype_id, rank""")),

    // ── r02: extractor selection — the reference's `extractors[0]` rule ──
    // (__init__.py:110-115) + how many alternatives were discovered, with
    // the 'Discovered multiple extractors' warning (__init__.py:110-113)
    // surfaced as a first-class flag instead of a log line.
    GQuery("r02_extractor_select",
      (s, d) => {
        import s.implicits._
        Registry.filetypes(s)
          .filter(size($"registered_extractors") > 0)
          .select($"filetype_id",
            element_at($"registered_extractors", 1).as("chosen_extractor"),
            size($"registered_extractors").as("n_alternatives"),
            (size($"registered_extractors") > 1).as("multiple_found"))
          .orderBy($"filetype_id")
      },
      Some(s"""
        SELECT filetype_id,
               registered_extractors[1] AS chosen_extractor,
               CAST(len(registered_extractors) AS INT) AS n_alternatives,
               len(registered_extractors) > 1 AS multiple_found
        FROM ${Registry.filetypesSql}
        WHERE len(registered_extractors) > 0
        ORDER BY filetype_id""")),

    // ── r03: usage resolution — parse_usage semantics (__init__.py: ──
    // 443-456): first usage matching the preferred mode, else the LAST
    // usage block (the reference's loop falls through to the final one).
    GQuery("r03_usage_resolution",
      (s, d) => {
        import s.implicits._
        resolvedUsages(s)
          .select($"extractor_id", $"preferred_mode", $"method".as("resolved_method"), $"command")
          .orderBy($"extractor_id", $"preferred_mode")
      },
      Some(s"""
        WITH u AS (SELECT * FROM ${Registry.usagesSql}),
        modes AS (SELECT unnest(['python', 'cli']) AS preferred_mode),
        rs AS (
          SELECT extractor_id, preferred_mode,
                 max(CASE WHEN method = preferred_mode THEN 1 ELSE 0 END) AS has_pref,
                 min(CASE WHEN method = preferred_mode THEN idx END) AS pref_idx,
                 max(idx) AS last_idx
          FROM u, modes GROUP BY extractor_id, preferred_mode)
        SELECT rs.extractor_id, rs.preferred_mode,
               u.method AS resolved_method, u.command
        FROM rs JOIN u ON rs.extractor_id = u.extractor_id
               AND u.idx = (CASE WHEN rs.has_pref = 1 THEN rs.pref_idx ELSE rs.last_idx END)
        ORDER BY rs.extractor_id, rs.preferred_mode""")),

    // ── r04: command templating — apply_template_args (__init__.py: ──
    // 401-441) at full fidelity: the resolved usage command, the four
    // default fields MERGED UNDER the per-filetype template override
    // (__init__.py:236-243,429-433), python repr vs cli raw substitution,
    // output_path defaulting to input_path with a .json suffix
    // (__init__.py:249-250), and null values leaving their placeholder
    // un-substituted ({{ output_type }} survives when the caller passed
    // no output_type and no override exists).
    GQuery("r04_template_apply",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d).filter($"doc_id" < 40)
        val chosen = Registry.filetypes(s)
          .filter(size($"registered_extractors") > 0)
          .select($"filetype_id", element_at($"registered_extractors", 1).as("extractor_id"))
        files
          .join(broadcast(chosen), Seq("filetype_id"))
          .join(broadcast(resolvedUsages(s)), Seq("extractor_id", "preferred_mode"))
          .join(broadcast(Registry.templates(s)), Seq("extractor_id", "filetype_id"), "left_outer")
          .select($"doc_id", $"extractor_id", $"method",
            applyTemplate($"command", $"method", defaultFields(s)).as("templated"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH files AS (SELECT * FROM $catalogSql WHERE doc_id < 40),
        chosen AS (
          SELECT filetype_id, registered_extractors[1] AS extractor_id
          FROM ${Registry.filetypesSql}
          WHERE len(registered_extractors) > 0),
        $resolvedSqlCtes,
        j AS (
          SELECT f.doc_id, c.extractor_id, r.method, r.command,
                 f.filetype_id, f.input_path, f.output_type,
                 t.t_input_type, t.t_input_path, t.t_output_type, t.t_output_path
          FROM files f
            JOIN chosen c ON f.filetype_id = c.filetype_id
            JOIN resolved r ON c.extractor_id = r.extractor_id
                 AND f.preferred_mode = r.preferred_mode
            LEFT JOIN ${Registry.templatesSql} t
                 ON t.extractor_id = c.extractor_id AND t.filetype_id = f.filetype_id)
        SELECT doc_id, extractor_id, method,
               ${applyTemplateSql("command")} AS templated
        FROM j ORDER BY doc_id""")),

    // ── r05: full dispatch — extract() end-to-end as one declarative ──
    // plan: catalog ⋈ broadcast registry ⋈ usage resolution ⋈ templating;
    // filetypes with no registered extractor surface status='no_extractor'
    // (the reference's RuntimeError path, __init__.py:106-109).
    GQuery("r05_file_dispatch",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d)
        val chosen = Registry.filetypes(s)
          .select($"filetype_id",
            when(size($"registered_extractors") > 0, element_at($"registered_extractors", 1)).as("extractor_id"))
        files
          .join(broadcast(chosen), Seq("filetype_id"), "left_outer")
          .join(broadcast(resolvedUsages(s)), Seq("extractor_id", "preferred_mode"), "left_outer")
          .join(broadcast(Registry.templates(s)), Seq("extractor_id", "filetype_id"), "left_outer")
          .select($"doc_id", $"filetype_id",
            coalesce($"extractor_id", lit("NONE")).as("extractor_id"),
            coalesce($"method", lit("none")).as("method"),
            when($"extractor_id".isNull, lit("no_extractor")).otherwise(lit("ok")).as("status"),
            coalesce(applyTemplate($"command", $"method", defaultFields(s)), lit("")).as("exec_command"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH files AS (SELECT * FROM $catalogSql),
        chosen AS (
          SELECT filetype_id,
                 CASE WHEN len(registered_extractors) > 0 THEN registered_extractors[1] END AS extractor_id
          FROM ${Registry.filetypesSql}),
        $resolvedSqlCtes,
        j AS (
          SELECT f.doc_id, f.filetype_id AS filetype_id, c.extractor_id, r.method, r.command,
                 f.input_path, f.output_type,
                 t.t_input_type, t.t_input_path, t.t_output_type, t.t_output_path
          FROM files f
            LEFT JOIN chosen c ON f.filetype_id = c.filetype_id
            LEFT JOIN resolved r ON c.extractor_id = r.extractor_id
                 AND f.preferred_mode = r.preferred_mode
            LEFT JOIN ${Registry.templatesSql} t
                 ON t.extractor_id = c.extractor_id AND t.filetype_id = f.filetype_id)
        SELECT doc_id, filetype_id,
               COALESCE(extractor_id, 'NONE') AS extractor_id,
               COALESCE(method, 'none') AS method,
               CASE WHEN extractor_id IS NULL THEN 'no_extractor' ELSE 'ok' END AS status,
               COALESCE(${applyTemplateSql("command")}, '') AS exec_command
        FROM j ORDER BY doc_id""")),

    // ── r06: distributed batch extraction — the README "parallel ──
    // processing" plan: every dispatched file yields a structured metadata
    // row (deterministic stub decode: token stats + content checksum; the
    // real per-format decode plugs into Extraction.extractPartition).
    GQuery("r06_batch_extract",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d)
        val meta = Tables.load(s, d, "documents")
          .select($"doc_id", $"text")
          .join(files, Seq("doc_id"))
          .filter($"filetype_id" =!= "csv")
        meta.select($"doc_id", $"filetype_id",
            size(split($"text", " ")).as("n_tokens"),
            length($"text").as("n_bytes"),
            md5($"text").as("checksum"),
            split($"text", " ").getItem(0).as("first_token"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH files AS (SELECT * FROM $catalogSql)
        SELECT d.doc_id, f.filetype_id,
               CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
               CAST(length(d.text) AS INT) AS n_bytes,
               md5(d.text) AS checksum,
               string_split(d.text, ' ')[1] AS first_token
        FROM documents d JOIN files f ON d.doc_id = f.doc_id
        WHERE f.filetype_id <> 'csv'
        ORDER BY d.doc_id""")),

    // ── r07: installation rollout plan — which pip packages a cluster ──
    // needs for the catalog's dispatched extractors, weighted by file
    // count (MardaExtractor.install, __init__.py:179-217: one venv+pip
    // per extractor; distributed, that's one env per executor image).
    GQuery("r07_install_plan",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d)
        val chosen = Registry.filetypes(s)
          .filter(size($"registered_extractors") > 0)
          .select($"filetype_id", element_at($"registered_extractors", 1).as("extractor_id"))
        files.join(broadcast(chosen), Seq("filetype_id"))
          .groupBy($"extractor_id").agg(count(lit(1)).as("n_files"))
          .join(broadcast(Registry.installations(s)), Seq("extractor_id"))
          .select($"extractor_id", $"method", $"package", $"n_files")
          .orderBy($"extractor_id")
      },
      Some(s"""
        WITH files AS (SELECT * FROM $catalogSql),
        chosen AS (
          SELECT filetype_id, registered_extractors[1] AS extractor_id
          FROM ${Registry.filetypesSql}
          WHERE len(registered_extractors) > 0),
        counts AS (
          SELECT extractor_id, COUNT(*) AS n_files
          FROM files JOIN chosen ON files.filetype_id = chosen.filetype_id
          GROUP BY extractor_id)
        SELECT i.extractor_id, i.method, i.package, c.n_files
        FROM counts c JOIN ${Registry.installationsSql} i ON c.extractor_id = i.extractor_id
        ORDER BY i.extractor_id""")),

    // ── r08: URL inputs + inline extractor definitions — the two extract() ──
    // entry paths the registry lookup doesn't cover: http(s) input paths
    // are fetched to a local tmp file before dispatch (__init__.py:81-84 —
    // here a 'download' stage marker on the plan row), and a caller-supplied
    // `extractor_definition` bypasses the registry entirely
    // (__init__.py:53,132-138 — here an inline row unioned into the
    // broadcast registry dim, covering the csv filetype the registry
    // lacks).
    GQuery("r08_url_inline_dispatch",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d).filter($"doc_id" < 100)
          .withColumn("input_path",
            when($"doc_id" % 10 === 7,
              concat(lit("https://files.example.org/doc_"), $"doc_id", lit(".dat")))
              .otherwise($"input_path"))
        val registryChosen = Registry.filetypes(s)
          .filter(size($"registered_extractors") > 0)
          .select($"filetype_id", element_at($"registered_extractors", 1).as("extractor_id"),
            lit("registry").as("source"))
        val inline = Seq(("csv", "user-inline-csv", "inline"))
          .toDF("filetype_id", "extractor_id", "source")
        files
          .join(broadcast(registryChosen.unionByName(inline)), Seq("filetype_id"), "left_outer")
          .select($"doc_id", $"input_path",
            when($"input_path".startsWith("https://"), "download").otherwise("local").as("fetch_stage"),
            coalesce($"extractor_id", lit("NONE")).as("extractor_id"),
            coalesce($"source", lit("none")).as("source"),
            when($"extractor_id".isNull, lit("no_extractor")).otherwise(lit("ok")).as("status"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH files AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 7
                      THEN 'https://files.example.org/doc_' || doc_id || '.dat'
                      ELSE input_path END AS input_path,
                 filetype_id
          FROM $catalogSql WHERE doc_id < 100),
        chosen AS (
          SELECT filetype_id, registered_extractors[1] AS extractor_id, 'registry' AS source
          FROM ${Registry.filetypesSql}
          WHERE len(registered_extractors) > 0
          UNION ALL
          SELECT 'csv', 'user-inline-csv', 'inline'),
        j AS (
          SELECT f.doc_id, f.input_path, c.extractor_id, c.source
          FROM files f LEFT JOIN chosen c ON f.filetype_id = c.filetype_id)
        SELECT doc_id, input_path,
               CASE WHEN input_path LIKE 'https://%' THEN 'download' ELSE 'local' END AS fetch_stage,
               COALESCE(extractor_id, 'NONE') AS extractor_id,
               COALESCE(source, 'none') AS source,
               CASE WHEN extractor_id IS NULL THEN 'no_extractor' ELSE 'ok' END AS status
        FROM j ORDER BY doc_id""")),

    // ── r09: extractor coverage report — the registry-ops dashboard ──
    // over r05's dispatch: per extractor (including the NONE bucket of
    // undispatchable files), how many files it serves, how many
    // filetypes, and its share of the catalog. The rollup groups the
    // dispatch frame (catalog ⋈ broadcast registry choice) by extractor;
    // the catalog total rides in via a broadcast 1-row aggregate (q23's
    // pattern) so the share needs no second pass over the files.
    GQuery("r09_extractor_coverage",
      (s, d) => {
        import s.implicits._
        val chosen = Registry.filetypes(s)
          .select($"filetype_id",
            when(size($"registered_extractors") > 0,
              element_at($"registered_extractors", 1)).as("extractor_id"))
        val dispatched = catalog(s, d)
          .join(broadcast(chosen), Seq("filetype_id"), "left_outer")
          .select($"doc_id", $"filetype_id",
            coalesce($"extractor_id", lit("NONE")).as("extractor_id"))
        val total = dispatched.agg(count(lit(1)).as("total_files"))
        dispatched
          .groupBy($"extractor_id")
          .agg(count(lit(1)).as("n_files"),
            countDistinct($"filetype_id").as("n_filetypes"))
          .join(broadcast(total))
          .select($"extractor_id", $"n_files", $"n_filetypes",
            roundz($"n_files".cast(DoubleType) / $"total_files", 6).as("catalog_share"))
          .orderBy($"extractor_id")
      },
      Some(s"""
        WITH files AS (SELECT * FROM $catalogSql),
        chosen AS (
          SELECT filetype_id,
                 CASE WHEN len(registered_extractors) > 0 THEN registered_extractors[1] END AS extractor_id
          FROM ${Registry.filetypesSql}),
        dispatched AS (
          SELECT f.doc_id, f.filetype_id, COALESCE(c.extractor_id, 'NONE') AS extractor_id
          FROM files f LEFT JOIN chosen c ON f.filetype_id = c.filetype_id),
        total AS (SELECT COUNT(*) AS total_files FROM dispatched)
        SELECT extractor_id, COUNT(*) AS n_files,
               CAST(COUNT(DISTINCT filetype_id) AS BIGINT) AS n_filetypes,
               (ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(total_files), 6) + 0.0) AS catalog_share
        FROM dispatched, total
        GROUP BY extractor_id ORDER BY extractor_id""")),

    // ── r10: registry diff — what changed between two registry ──
    // snapshots: the sync/audit report a registry-backed pipeline runs
    // before rolling a new version (an extractor silently changing its
    // command is exactly what breaks batch extraction at 3am). FULL
    // OUTER join of the usage dims on (extractor_id, idx): added /
    // removed / changed / same, with the changed fields surfaced. Both
    // snapshots are dim-sized — the diff broadcasts; at scale this
    // composes with r05 to pre-compute which files a change invalidates.
    GQuery("r10_registry_diff",
      (s, d) => {
        import s.implicits._
        val v1 = Registry.usages(s)
        val v2Rows = Seq(
          // yadg python usage: command gains a timeout flag (changed)
          ("yadg", 0, "python", "yadg", "yadg.extractors.extract({{ input_type }}, {{ input_path }}, timeout=60)"),
          ("yadg", 1, "cli", "", "yadg extract {{ input_type }} {{ input_path }} --out {{ output_path }} --fmt {{ output_type }}"),
          ("galvani", 0, "python", "galvani", "galvani.MPRfile({{ input_path }})"),
          ("h5grove", 0, "cli", "", "h5dump {{ input_path }} > {{ output_path }}"),
          // pdfplumber-cli retired (removed); imagemagick-cli added
          ("imagemagick-cli", 0, "cli", "", "convert {{ input_path }} {{ output_path }}"))
        val v2 = v2Rows.toDF("extractor_id", "idx", "method", "setup", "command")
        v1.select($"extractor_id", $"idx", $"method".as("m1"), $"setup".as("s1"), $"command".as("c1"))
          .join(v2.select($"extractor_id", $"idx", $"method".as("m2"), $"setup".as("s2"), $"command".as("c2")),
            Seq("extractor_id", "idx"), "full_outer")
          .withColumn("status",
            when($"m1".isNull, "added")
              .when($"m2".isNull, "removed")
              .when($"m1" =!= $"m2" || $"s1" =!= $"s2" || $"c1" =!= $"c2", "changed")
              .otherwise("same"))
          .select($"extractor_id", $"idx", $"status",
            coalesce($"c2", $"c1").as("command"))
          .orderBy($"extractor_id", $"idx")
      },
      Some(s"""
        WITH v1 AS (SELECT * FROM ${Registry.usagesSql}),
        v2(extractor_id, idx, method, setup, command) AS (VALUES
          ('yadg', 0, 'python', 'yadg', 'yadg.extractors.extract({{ input_type }}, {{ input_path }}, timeout=60)'),
          ('yadg', 1, 'cli', '', 'yadg extract {{ input_type }} {{ input_path }} --out {{ output_path }} --fmt {{ output_type }}'),
          ('galvani', 0, 'python', 'galvani', 'galvani.MPRfile({{ input_path }})'),
          ('h5grove', 0, 'cli', '', 'h5dump {{ input_path }} > {{ output_path }}'),
          ('imagemagick-cli', 0, 'cli', '', 'convert {{ input_path }} {{ output_path }}'))
        SELECT COALESCE(v1.extractor_id, v2.extractor_id) AS extractor_id,
               COALESCE(v1.idx, v2.idx) AS idx,
               CASE WHEN v1.extractor_id IS NULL THEN 'added'
                    WHEN v2.extractor_id IS NULL THEN 'removed'
                    WHEN v1.method <> v2.method OR v1.setup <> v2.setup
                      OR v1.command <> v2.command THEN 'changed'
                    ELSE 'same' END AS status,
               COALESCE(v2.command, v1.command) AS command
        FROM v1 FULL OUTER JOIN v2
          ON v1.extractor_id = v2.extractor_id AND v1.idx = v2.idx
        ORDER BY extractor_id, idx""")),

    // ── r11: capability matrix — per filetype, can ANY of its registered ──
    // extractors run headless (cli) / embedded (python)? The "can I
    // batch-run this filetype on the cluster" pre-flight the reference
    // answers one HTTP call at a time (parse_usage per extractor,
    // `__init__.py:443-456`). Registered extractors explode (bounded by
    // registry size), usages join by extractor-id equality, and the
    // per-filetype capability folds with max-of-indicators — all on
    // broadcast-sized dims.
    GQuery("r11_capability_matrix",
      (s, d) => {
        import s.implicits._
        val reg = Registry.filetypes(s)
          .select($"filetype_id", explode_outer($"registered_extractors").as("extractor_id"))
        val usage = Registry.usages(s)
          .select($"extractor_id", $"method")
        reg.join(usage, Seq("extractor_id"), "left_outer")
          .groupBy($"filetype_id")
          .agg(countDistinct($"extractor_id").as("n_extractors"),
            max(when($"method" === "cli", 1L).otherwise(0L)).as("cli_capable"),
            max(when($"method" === "python", 1L).otherwise(0L)).as("python_capable"))
          .withColumn("batch_ready", $"cli_capable" + $"python_capable" > 0)
          .orderBy($"filetype_id")
      },
      Some(s"""
        WITH reg AS (
          SELECT filetype_id, unnest(
            CASE WHEN len(registered_extractors) = 0 THEN [NULL]
                 ELSE registered_extractors END) AS extractor_id
          FROM ${Registry.filetypesSql}),
        usage AS (SELECT extractor_id, method FROM ${Registry.usagesSql})
        SELECT filetype_id,
               CAST(COUNT(DISTINCT reg.extractor_id) AS BIGINT) AS n_extractors,
               CAST(MAX(CASE WHEN usage.method = 'cli' THEN 1 ELSE 0 END) AS BIGINT) AS cli_capable,
               CAST(MAX(CASE WHEN usage.method = 'python' THEN 1 ELSE 0 END) AS BIGINT) AS python_capable,
               MAX(CASE WHEN usage.method = 'cli' THEN 1 ELSE 0 END)
                 + MAX(CASE WHEN usage.method = 'python' THEN 1 ELSE 0 END) > 0 AS batch_ready
        FROM reg LEFT JOIN usage ON reg.extractor_id = usage.extractor_id
        GROUP BY filetype_id ORDER BY filetype_id""")),

    // ── r12: dispatch preflight status — the reference's hard error ──
    // paths as a first-class per-file column instead of exceptions: local
    // files are stat()-checked BEFORE the registry lookup ('File does not
    // exist', __init__.py:88-89), URL inputs skip the check and enter the
    // download stage (__init__.py:81-84), and filetypes with no registered
    // extractor fail the lookup ('No extractors found', __init__.py:
    // 106-109). A batch run reports on this frame and filters status='ok'/
    // 'fetch' into r05's templating — per-file errors must not kill a
    // 10^10-file job the way the reference's RuntimeError kills one call.
    // The stat() result is a deterministic stub column (every 13th local
    // file is gone by dispatch time); a real runner fills it from the
    // filesystem listing it already holds.
    GQuery("r12_dispatch_status",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d)
          .withColumn("input_path",
            when($"doc_id" % 10 === 7,
              concat(lit("https://files.example.org/doc_"), $"doc_id", lit(".dat")))
              .otherwise($"input_path"))
          .withColumn("is_url", $"input_path".startsWith("https://"))
          .withColumn("file_exists", $"is_url" || $"doc_id" % 13 =!= 0)
        val chosen = Registry.filetypes(s)
          .select($"filetype_id",
            when(size($"registered_extractors") > 0,
              element_at($"registered_extractors", 1)).as("extractor_id"))
        files.join(broadcast(chosen), Seq("filetype_id"), "left_outer")
          .select($"doc_id", $"input_path",
            coalesce($"extractor_id", lit("NONE")).as("extractor_id"),
            when(!$"file_exists", "error:file_missing")
              .when($"extractor_id".isNull, "error:no_extractor")
              .when($"is_url", "fetch")
              .otherwise("ok").as("status"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH files AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 7
                      THEN 'https://files.example.org/doc_' || doc_id || '.dat'
                      ELSE input_path END AS input_path,
                 filetype_id,
                 doc_id % 10 = 7 AS is_url,
                 (doc_id % 10 = 7) OR (doc_id % 13 <> 0) AS file_exists
          FROM $catalogSql),
        chosen AS (
          SELECT filetype_id,
                 CASE WHEN len(registered_extractors) > 0 THEN registered_extractors[1] END AS extractor_id
          FROM ${Registry.filetypesSql})
        SELECT f.doc_id, f.input_path,
               COALESCE(c.extractor_id, 'NONE') AS extractor_id,
               CASE WHEN NOT f.file_exists THEN 'error:file_missing'
                    WHEN c.extractor_id IS NULL THEN 'error:no_extractor'
                    WHEN f.is_url THEN 'fetch'
                    ELSE 'ok' END AS status
        FROM files f LEFT JOIN chosen c ON f.filetype_id = c.filetype_id
        ORDER BY f.doc_id""")),

    // ── r13: residual-placeholder audit — which template fields survive ──
    // substitution un-filled, per extractor and mode. The reference
    // silently `continue`s on None values (__init__.py:431-433), so a
    // command can reach execution with a literal `{{ output_type }}` in
    // it; this is the lint a batch runner prints before launching 10^10
    // subprocesses. Same broadcast dispatch chain as r05; the residual
    // scan is one regexp_extract_all over the templated command column.
    GQuery("r13_residual_audit",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d)
        val chosen = Registry.filetypes(s)
          .filter(size($"registered_extractors") > 0)
          .select($"filetype_id", element_at($"registered_extractors", 1).as("extractor_id"))
        files
          .join(broadcast(chosen), Seq("filetype_id"))
          .join(broadcast(resolvedUsages(s)), Seq("extractor_id", "preferred_mode"))
          .join(broadcast(Registry.templates(s)), Seq("extractor_id", "filetype_id"), "left_outer")
          .select($"extractor_id", $"method",
            applyTemplate($"command", $"method", defaultFields(s)).as("exec"))
          .select($"extractor_id", $"method",
            explode(expr("regexp_extract_all(exec, '\\\\{\\\\{ ([a-z_]+) \\\\}\\\\}', 1)")).as("residual_field"))
          .groupBy($"extractor_id", $"method", $"residual_field")
          .agg(count(lit(1)).as("n_commands"))
          .orderBy($"extractor_id", $"method", $"residual_field")
      },
      Some(s"""
        WITH files AS (SELECT * FROM $catalogSql),
        chosen AS (
          SELECT filetype_id, registered_extractors[1] AS extractor_id
          FROM ${Registry.filetypesSql}
          WHERE len(registered_extractors) > 0),
        $resolvedSqlCtes,
        j AS (
          SELECT f.doc_id, c.extractor_id, r.method, r.command,
                 f.filetype_id, f.input_path, f.output_type,
                 t.t_input_type, t.t_input_path, t.t_output_type, t.t_output_path
          FROM files f
            JOIN chosen c ON f.filetype_id = c.filetype_id
            JOIN resolved r ON c.extractor_id = r.extractor_id
                 AND f.preferred_mode = r.preferred_mode
            LEFT JOIN ${Registry.templatesSql} t
                 ON t.extractor_id = c.extractor_id AND t.filetype_id = f.filetype_id),
        residual AS (
          SELECT extractor_id, method,
                 unnest(regexp_extract_all(${applyTemplateSql("command")},
                   '\\{\\{ ([a-z_]+) \\}\\}', 1)) AS residual_field
          FROM j)
        SELECT extractor_id, method, residual_field, COUNT(*) AS n_commands
        FROM residual
        GROUP BY extractor_id, method, residual_field
        ORDER BY extractor_id, method, residual_field""")),

    // ── r14: python call-plan parse — `_prepare_python` (__init__.py: ──
    // 308-346) as relational columns: the templated python command is
    // parsed into its function tree (dotted head before the first '('),
    // positional args, and kwargs, at REFERENCE fidelity including the
    // quirks its own TODO admits ("this parser will need to be made very
    // robust"): the argument span is text between the FIRST '(' and the
    // FIRST ')' (so nested calls gross-parse to the inner head), '()'
    // yields one empty positional, dequote strips ONE layer of matching
    // quotes then re-strips whitespace, a segment with two '='s or any
    // brace raises (here: status='error:cannot_parse' with the offending
    // raw segment), a command with no '(' at all is the IndexError path
    // (status='error:no_call'), and duplicate kwargs last-win
    // (dict.update order). has_residual composes r13's lint: an arg that
    // still carries a '{{ field }}' placeholder reached the call parse
    // unfilled. One shared scalar-fragment SQL text runs on both engines
    // (only the array-explode syntax differs); parsing is map-side
    // column work over the broadcast dispatch chain — the only shuffles
    // are the |commands|-sized kwarg last-wins aggregate and positional
    // renumbering window, both keyed by cmd_id.
    GQuery("r14_call_plan_parse",
      (s, d) => {
        import s.implicits._
        val files = catalog(s, d).filter($"doc_id" < 40)
        val chosen = Registry.filetypes(s)
          .filter(size($"registered_extractors") > 0)
          .select($"filetype_id", element_at($"registered_extractors", 1).as("extractor_id"))
        val real = files
          .join(broadcast(chosen), Seq("filetype_id"))
          .join(broadcast(resolvedUsages(s)), Seq("extractor_id", "preferred_mode"))
          .join(broadcast(Registry.templates(s)), Seq("extractor_id", "filetype_id"), "left_outer")
          .filter($"method" === "python")
          .select($"doc_id".as("cmd_id"), $"extractor_id",
            applyTemplate($"command", $"method", defaultFields(s)).as("command"))
        val fixtures = parseFixtures.toDF("cmd_id", "extractor_id", "command")
        real.unionByName(fixtures).createOrReplaceTempView("g_r14_cmds")
        s.sql(callPlanParseSql(
          cmdsRel = "(SELECT cmd_id, extractor_id, command FROM g_r14_cmds)",
          segsCte = """
            SELECT cmd_id, extractor_id, fn_head, CAST(pos + 1 AS INT) AS seg_idx, seg
            FROM base LATERAL VIEW posexplode(split(inner_args, ',')) t AS pos, seg
            WHERE has_call"""))
      },
      Some(callPlanParseSql(
        cmdsRel = s"""(
          WITH files AS (SELECT * FROM $catalogSql WHERE doc_id < 40),
          chosen AS (
            SELECT filetype_id, registered_extractors[1] AS extractor_id
            FROM ${Registry.filetypesSql}
            WHERE len(registered_extractors) > 0),
          $resolvedSqlCtes,
          j AS (
            SELECT f.doc_id, c.extractor_id, r.method, r.command,
                   f.filetype_id, f.input_path, f.output_type,
                   t.t_input_type, t.t_input_path, t.t_output_type, t.t_output_path
            FROM files f
              JOIN chosen c ON f.filetype_id = c.filetype_id
              JOIN resolved r ON c.extractor_id = r.extractor_id
                   AND f.preferred_mode = r.preferred_mode
              LEFT JOIN ${Registry.templatesSql} t
                   ON t.extractor_id = c.extractor_id AND t.filetype_id = f.filetype_id)
          SELECT CAST(doc_id AS BIGINT) AS cmd_id, extractor_id,
                 ${applyTemplateSql("command")} AS command
          FROM j WHERE method = 'python'
          UNION ALL
          SELECT * FROM (VALUES $parseFixturesSql) AS fx(cmd_id, extractor_id, command))""",
        segsCte = """
            SELECT cmd_id, extractor_id, fn_head,
                   CAST(unnest(range(1, len(string_split(inner_args, ',')) + 1)) AS INT) AS seg_idx,
                   unnest(string_split(inner_args, ',')) AS seg
            FROM base WHERE has_call""")))
  )

  /** Adversarial call-parse fixtures, one per `_prepare_python` branch:
    * mixed quoting + kwargs, duplicate-kwarg last-wins, the two
    * cannot-parse raises (double '=' incl. a quoted value containing
    * '=', braces), the no-'(' IndexError path, the empty-parens
    * one-empty-arg quirk, the nested-call gross-parse, whitespace
    * re-stripping, and a residual placeholder surviving into an arg.
    * Single source of truth for BOTH engines — [[parseFixturesSql]]
    * renders these rows as a VALUES list, so the strings cannot drift.
    */
  private def parseFixtures: Seq[(Long, String, String)] = Seq(
    (9001L, "fixture", "pkg.mod.fn('a', \"b\", kw1=3, kw2='x y')"),
    (9002L, "fixture", "pkg.fn(kw=1, kw=2)"),
    (9003L, "fixture", "pkg.fn(a==b)"),
    (9004L, "fixture", "pkg.fn(m={1: 2})"),
    (9005L, "fixture", "pkg.fn"),
    (9006L, "fixture", "pkg.fn()"),
    (9007L, "fixture", "outer.fn(inner.g(x), y)"),
    (9008L, "fixture", "mod.run( 'spaced'  , plain , q=\"dq\" )"),
    (9009L, "fixture", "mod.run('{{ output_type }}', '/tmp/x')"),
    (9010L, "fixture", "mod.run(x='a=b')"),
    (9011L, "fixture", "mod.run(one='1')"))

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  private def parseFixturesSql: String = parseFixtures
    .map { case (id, ex, cmd) =>
      s"(CAST($id AS BIGINT), ${sqlStr(ex)}, ${sqlStr(cmd)})" }
    .mkString(",\n          ")

  /** One reference `dequote` layer: removeprefix(q) then removesuffix(q)
    * — each strips only when present (`__init__.py:316-324`). Emitted as
    * engine-portable SQL text (substr/length/greatest only).
    */
  private def stripQuoteSql(s: String, q: String): String = {
    val afterPre = s"(CASE WHEN substr($s, 1, 1) = $q THEN substr($s, 2) ELSE $s END)"
    s"""(CASE WHEN substr($afterPre, greatest(length($afterPre), 1), 1) = $q
         THEN substr($afterPre, 1, greatest(length($afterPre) - 1, 0))
         ELSE $afterPre END)"""
  }

  /** Full reference dequote: strip → one quote layer (single' wins over
    * double", each triggered by EITHER end matching) → strip again.
    */
  private def dequoteSql(x: String): String = {
    val t = s"trim($x)"
    s"""trim(CASE
        WHEN substr($t, 1, 1) = chr(39)
          OR substr($t, greatest(length($t), 1), 1) = chr(39)
          THEN ${stripQuoteSql(t, "chr(39)")}
        WHEN substr($t, 1, 1) = chr(34)
          OR substr($t, greatest(length($t), 1), 1) = chr(34)
          THEN ${stripQuoteSql(t, "chr(34)")}
        ELSE $t END)"""
  }

  /** The r14 parse plan, one SQL text for both engines modulo the
    * array-explode dialect (`segsCte`): cmds → base (head/span split) →
    * segments → per-segment marks → first-bad-segment errors → ok rows
    * (positional renumber window + kwarg last-wins aggregate) ∪ error
    * rows, with fn_depth and the r13-composing has_residual lint on
    * every row.
    */
  private def callPlanParseSql(cmdsRel: String, segsCte: String): String = {
    val dqSeg = dequoteSql("seg")
    val dqKey = dequoteSql("split_part(seg, '=', 1)")
    val dqVal = dequoteSql("split_part(seg, '=', 2)")
    s"""
    WITH cmds AS (SELECT * FROM $cmdsRel),
    base AS (
      SELECT cmd_id, extractor_id,
             split_part(command, '(', 1) AS fn_head,
             instr(command, '(') > 0 AS has_call,
             split_part(split_part(command, '(', 2), ')', 1) AS inner_args
      FROM cmds),
    segs AS ($segsCte),
    marked AS (
      SELECT cmd_id, extractor_id, fn_head, seg_idx, seg,
             instr(seg, '=') > 0 AS is_kw,
             (instr(seg, '=') > 0 AND (
                length(seg) - length(replace(seg, '=', '')) > 1
                OR instr(seg, '{') > 0 OR instr(seg, '}') > 0)) AS bad
      FROM segs),
    errs AS (
      SELECT cmd_id, min(seg_idx) AS err_idx FROM marked WHERE bad GROUP BY cmd_id),
    ok_segs AS (
      SELECT m.* FROM marked m LEFT JOIN errs e ON m.cmd_id = e.cmd_id
      WHERE e.cmd_id IS NULL),
    pos_args AS (
      SELECT cmd_id, extractor_id, fn_head, 'arg' AS part,
             CAST(ROW_NUMBER() OVER (PARTITION BY cmd_id ORDER BY seg_idx) AS INT) AS pos,
             CAST(NULL AS STRING) AS kw_key,
             $dqSeg AS val, 'ok' AS status
      FROM ok_segs WHERE NOT is_kw),
    kw_raw AS (
      SELECT cmd_id, extractor_id, fn_head, seg_idx,
             $dqKey AS kw_key, $dqVal AS kw_val
      FROM ok_segs WHERE is_kw),
    kw_args AS (
      SELECT cmd_id, extractor_id, fn_head, 'kwarg' AS part,
             CAST(NULL AS INT) AS pos, kw_key,
             max_by(kw_val, seg_idx) AS val, 'ok' AS status
      FROM kw_raw GROUP BY cmd_id, extractor_id, fn_head, kw_key),
    err_rows AS (
      SELECT m.cmd_id, m.extractor_id, m.fn_head, 'error' AS part,
             CAST(NULL AS INT) AS pos, CAST(NULL AS STRING) AS kw_key,
             m.seg AS val, 'error:cannot_parse' AS status
      FROM marked m JOIN errs e ON m.cmd_id = e.cmd_id AND m.seg_idx = e.err_idx),
    nocall_rows AS (
      SELECT cmd_id, extractor_id, fn_head, 'error' AS part,
             CAST(NULL AS INT) AS pos, CAST(NULL AS STRING) AS kw_key,
             CAST(NULL AS STRING) AS val, 'error:no_call' AS status
      FROM base WHERE NOT has_call),
    unioned AS (
      SELECT * FROM pos_args UNION ALL SELECT * FROM kw_args
      UNION ALL SELECT * FROM err_rows UNION ALL SELECT * FROM nocall_rows)
    SELECT CAST(cmd_id AS BIGINT) AS cmd_id, extractor_id, fn_head,
           CAST(length(fn_head) - length(replace(fn_head, '.', '')) + 1 AS INT) AS fn_depth,
           part, pos, kw_key, val,
           coalesce(val LIKE '%{{ %', false) AS has_residual,
           status
    FROM unioned
    ORDER BY cmd_id, part, coalesce(pos, 2147483647), coalesce(kw_key, '')"""
  }
}
