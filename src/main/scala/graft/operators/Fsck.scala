package graft.operators

import graft.sources.{CorpusLayout, StatsManifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `CHECK TABLE` — the fsck of the corpus layout (SURVEY §2.H): audit
  * the SERVED generation's physical invariants so an operator can
  * verify a corpus before a training run instead of trusting it. Every
  * check is sized honestly:
  *
  *  - driver-side metadata (markers, file naming, mapping validity,
  *    manifest coverage, dv readability): directory listings only;
  *  - `bucket_placement`: ONE distributed key-column scan — every row
  *    must live in `pmod(hash(key), B)`, the exact expression the
  *    bucketed writer used (a misplace breaks every zero-Exchange join
  *    silently, the worst class of corruption because results are
  *    wrong, not missing);
  *  - `key_uniqueness`: one groupBy over the SERVING view (what
  *    readers actually see, dv compose and mapping included);
  *  - `stats_soundness`: re-derive the file stats with the SAME
  *    builder into a scratch dir and require the committed bounds to
  *    CONTAIN the fresh ones (hard-linked carries must be verbatim;
  *    a narrower committed bound would prune live rows). This is the
  *    one corpus-sized check — it is the audit's point; run it in the
  *    same maintenance window as compaction.
  *
  * Failures are facts, not guesses: each row is (check, status,
  * details) with status ok / warn / FAIL — warn marks sound-but-
  * suboptimal states (unknown files are never pruned; stale manifest
  * entries never match a listing) and FAIL marks serving-correctness
  * hazards. SQL spelling: `CHECK TABLE graft_cl_…` (GraftSqlParser).
  */
object Fsck {

  final case class Finding(check: String, status: String, details: String)

  def checkTable(s: SparkSession, corpusDir: String,
                 table: String = "documents"): Seq[Finding] = {
    val keyCol = CorpusLayout.keyed.getOrElse(table,
      throw new IllegalArgumentException(
        s"table '$table' has no bucketed layout key (CorpusLayout.keyed)"))
    val served = CorpusLayout.ifPresent(s, corpusDir, table).getOrElse(
      throw new IllegalStateException(
        s"no bucketed layout for ($corpusDir, $table) — nothing to check"))
    val loc = CorpusLayout.servedGeneration(s, corpusDir, table).getOrElse(
      throw new IllegalStateException(
        s"($corpusDir, $table) is served pre-epoch — CHECK TABLE audits " +
          "the generation chain"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    def add(check: String, ok: Boolean, details: String,
            failStatus: String = "FAIL"): Unit =
      out += Finding(check, if (ok) "ok" else failStatus, details)

    // ── markers: the generation must carry its completeness pair
    val bFile = java.nio.file.Paths.get(loc, CorpusLayout.BucketsMarker)
    val hasMarkers = java.nio.file.Files.exists(
      java.nio.file.Paths.get(loc, "_SUCCESS")) &&
      java.nio.file.Files.exists(bFile)
    val buckets = if (!java.nio.file.Files.exists(bFile)) -1
      else scala.util.Try(new String(
        java.nio.file.Files.readAllBytes(bFile), "UTF-8").trim.toInt)
        .getOrElse(-1)
    add("markers", hasMarkers && buckets > 0,
      if (hasMarkers && buckets > 0) s"_SUCCESS + _BUCKETS (B=$buckets)"
      else s"missing/unreadable markers in $loc")

    // ── column mapping: physical slots must exist, the key must be
    // neither renamed nor dropped, logical names must not collide
    val mapping = CorpusLayout.readMapping(loc)
    val physNames = CorpusLayout.physicalSchema(
      s, CorpusLayout.tableName(table, corpusDir)).fieldNames.toSet
    val mapBad =
      mapping.keys.filterNot(physNames.contains).map(p =>
        s"mapping names unknown physical column '$p'") ++
      mapping.get(keyCol).map(_ =>
        s"mapping touches the layout key '$keyCol'").toSeq ++ {
        val logical = physNames.toSeq.map(p =>
          mapping.getOrElse(p, Some(p))).collect { case Some(l) => l }
        logical.groupBy(identity).collect { case (n, d) if d.size > 1 =>
          s"logical name '$n' maps from ${d.size} physical slots" }
      }
    add("column_mapping", mapBad.isEmpty,
      if (mapBad.isEmpty) s"${mapping.size} entries" else mapBad.mkString("; "))

    // ── file naming: every data file must parse a bucket id < B
    val dataFiles = Option(new java.io.File(loc).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
    val badNames = dataFiles.map(_.getName).filter(n =>
      !MergeOps.bucketIdOf(n).exists(b => b >= 0 && b < buckets))
    add("file_naming", buckets > 0 && badNames.isEmpty,
      if (badNames.isEmpty) s"${dataFiles.size} data files"
      else s"unparseable/out-of-range bucket ids: ${badNames.take(3).mkString(", ")}")

    // ── bucket placement: one distributed key-column scan of the base
    // files; the file's name says where the writer put it, the hash
    // says where it belongs
    val raw = s.read.option("mergeSchema", "true").parquet(loc)
    // LAST `_NNNNN.` group, same rule as MergeOps.bucketIdOf — a name
    // carrying two such groups (schema-anchor rename + task suffix)
    // must classify identically here and in the writer/compaction path;
    // the greedy `.*` prefix pins the match to the final occurrence
    val misplaced = raw
      .select(col(keyCol),
        regexp_extract(input_file_name(), ".*_(\\d{5})\\.", 1).cast("int")
          .as("__fb"))
      .filter(col("__fb").isNotNull &&
        pmod(hash(col(keyCol)), lit(buckets)).cast("int") =!= col("__fb"))
      .count()
    add("bucket_placement", misplaced == 0,
      if (misplaced == 0) "every row in pmod(hash(key), B)"
      else s"$misplaced rows outside their hash bucket — bucket-co-located joins are WRONG for these keys")

    // ── key uniqueness + non-null on the SERVING view (dv compose and
    // mapping included — this is what readers see)
    val dupes = served.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).count()
    val nullKeys = served.filter(col(keyCol).isNull).count()
    add("key_uniqueness", dupes == 0 && nullKeys == 0,
      if (dupes == 0 && nullKeys == 0) "one row per key, no NULL keys"
      else s"$dupes duplicated keys, $nullKeys NULL keys")

    // ── manifest: coverage (warn-grade: unknown files are never pruned,
    // stale entries never match a listing) and bound SOUNDNESS
    // (FAIL-grade: a committed bound narrower than the data prunes
    // live rows)
    if (StatsManifest.hasManifest(loc)) {
      val committed = StatsManifest.read(
        s, StatsManifest.manifestDirFor(loc)).get.cache()
      try {
        val known = committed.select("file").distinct()
          .collect().map(_.getString(0)).toSet
        val present = dataFiles.map(_.getName).toSet
        val unknown = present -- known
        val stale = known -- present
        add("manifest_coverage", unknown.isEmpty && stale.isEmpty,
          (if (unknown.isEmpty && stale.isEmpty) s"${known.size} files covered"
           else s"${unknown.size} unknown (never pruned), " +
             s"${stale.size} stale entries"),
          failStatus = "warn")
        val statCols = committed.select("col").distinct()
          .collect().map(_.getString(0)).toSeq
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_fsck_stats").toString
        try {
          StatsManifest.build(s, loc, statCols, scratch)
          val fresh = StatsManifest.read(s, scratch).get
          def contains(pre: String) = {
            val cm = committed.as("c").join(fresh.as("f"),
              col("c.file") === col("f.file") && col("c.col") === col("f.col"))
            cm.filter(
              (col(s"c.min_$pre").isNotNull && col(s"f.min_$pre").isNotNull &&
                col(s"c.min_$pre") > col(s"f.min_$pre")) ||
              (col(s"c.max_$pre").isNotNull && col(s"f.max_$pre").isNotNull &&
                col(s"c.max_$pre") < col(s"f.max_$pre"))).count()
          }
          val rowDrift = committed.as("c").join(fresh.as("f"),
              col("c.file") === col("f.file") && col("c.col") === col("f.col"))
            .filter(col("c.rows") =!= col("f.rows") ||
              col("c.nulls") =!= col("f.nulls")).count()
          val leaks = contains("long") + contains("dbl") + contains("str")
          add("stats_soundness", leaks == 0 && rowDrift == 0,
            if (leaks == 0 && rowDrift == 0)
              s"bounds contain the data for ${statCols.size} stat columns"
            else s"$leaks bound violations, $rowDrift row/null drifts — " +
              "pruning may drop live rows; rebuild the manifest")
        } finally graft.FsUtil.deleteRecursively(
          java.nio.file.Paths.get(scratch))
      } finally committed.unpersist()
    }

    // ── dv sidecar: readable, and tombstones carry usable keys
    if (CorpusLayout.hasDv(loc)) {
      val ok = scala.util.Try {
        val tombs = s.read.parquet(s"$loc/${CorpusLayout.DvDir}/tombstones")
        val deltas = s.read.parquet(s"$loc/${CorpusLayout.DvDir}/deltas")
        val badT = tombs.filter(col(keyCol).isNull).count()
        val dupD = deltas.groupBy(col(keyCol)).count()
          .filter(col("count") > 1).count()
        (badT, dupD)
      }
      add("dv_sidecar", ok.toOption.exists(t => t._1 == 0 && t._2 == 0),
        ok.fold(e => s"unreadable sidecar: ${e.getMessage}",
          t => if (t._1 == 0 && t._2 == 0) "tombstones keyed, deltas unique"
            else s"${t._1} NULL tombstone keys, ${t._2} duplicate delta keys"))
    }
    out.toSeq
  }
}
