package graft.operators

import graft.sources.CorpusLayout
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC MERGE — the APPLY verb of the incremental-corpus lifecycle
  * (SURVEY §2.H, §2.I p26).
  *
  * The engine can already diff two releases (p17), null-safe-join CDC
  * keys (q47), and dedup incremental ingest waves (d25/IncrementalDedup);
  * this module closes the loop by applying a changeset to a corpus:
  * MERGE INTO semantics — matched→update, not-matched→insert,
  * matched+tombstone→delete — expressed as the anti+union composition
  * Catalyst plans well, plus the inverse operation ([[changeset]]) that
  * derives a minimal changeset FROM two releases, so
  * `applyChanges(v1, changeset(v1, v2)) ≡ v2` row-for-row (the p26
  * oracle law: the DuckDB side computes v2 directly, the Spark side
  * goes diff → changeset → merge).
  *
  * Changesets are FULL-ROW upserts (a re-crawled document replaces its
  * old payload wholesale) plus tombstones — the shape a crawl/CDC feed
  * actually emits. Column-granular updates would force a read-modify-
  * write of the matched row; full-row upserts keep the apply a pure
  * anti-join + union, which is what lets it run shuffle-free over the
  * bucketed [[CorpusLayout]] (see [[applyToLayout]]).
  *
  * Scale discipline (100 TB):
  *  - the apply touches the target ONCE: one LEFT ANTI join on the key
  *    (broadcast when the changeset is day-sized — the common case — so
  *    the corpus never shuffles; sort-merge over buckets when both sides
  *    are bucketed, still zero Exchange on the corpus side) and one
  *    union with the upsert rows;
  *  - [[changeset]] hashes both releases' payloads FIRST and diffs
  *    (key, hash) pairs — p17's discipline: the wide text column never
  *    rides the diff join; upsert payloads are fetched by a key
  *    semi-join-back bounded by the change count;
  *  - [[applyToLayout]] writes the merged corpus as a NEW bucketed
  *    generation next to the old one (VectorIndexStore's versioning
  *    recipe): in-flight readers of the previous generation keep intact
  *    files, and every post-apply id-keyed join stays Exchange-free.
  */
object MergeOps {

  /** Column marking a changeset row as a delete. Upserts carry the full
    * new payload with `tombstone = false`; tombstones carry the key and
    * `tombstone = true` (payload columns are ignored — null by
    * convention from [[changeset]]).
    */
  val TombstoneCol = "tombstone"

  /** MERGE INTO target USING changes: matched upsert rows replace the
    * target row, unmatched upserts insert, matched tombstones delete.
    * Unmatched tombstones are no-ops (MERGE's WHEN MATCHED AND delete
    * clause — deleting a row that's already gone is not an error, which
    * is what makes a changeset REPLAYABLE: applying it twice yields the
    * same corpus).
    *
    * `changes` must carry the key, every payload column of `target`
    * (same names), and [[TombstoneCol]]. Exactly-one-row-per-key is the
    * caller's contract, as in SQL MERGE (two changes for one key would
    * make the result order-dependent; [[changeset]] emits at most one).
    *
    * Plan shape: target LEFT ANTI changes.keys (the untouched rows — the
    * only corpus-sized stage, broadcast or bucket-co-located) UNION ALL
    * changes.upserts. Nothing pairwise, no window, no global sort.
    */
  def applyChanges(target: DataFrame, changes: DataFrame,
                   key: String = "doc_id"): DataFrame = {
    require(changes.columns.contains(TombstoneCol),
      s"changeset must carry a '$TombstoneCol' boolean column")
    val payload = target.columns.filterNot(_ == key)
    val missing = (Seq(key) ++ payload).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changeset is missing target columns: ${missing.mkString(", ")}")
    val untouched = target.join(changes.select(col(key)), Seq(key), "left_anti")
    val upserts = changes.filter(!col(TombstoneCol))
      .select(col(key) +: payload.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Derive the minimal full-row changeset that transforms release `v1`
    * into release `v2` (same schema, unique key both sides): changed and
    * added keys become upserts carrying v2's payload, removed keys become
    * tombstones, unchanged keys are absent. This is p17's row-level diff
    * emitted in applicable form — `applyChanges(v1, changeset(v1, v2))`
    * equals v2 row-for-row (p26's cross-engine law; MergeSpec pins it at
    * the row level including the bridging cases).
    *
    * Scale: both sides reduce to (key, 64-bit payload hash) before the
    * FULL OUTER diff join — the join carries 16 bytes/row, never text
    * (p17's rule). Upsert payloads come from a LEFT SEMI join-back of v2
    * against the changed/added key set, co-partitioned on the key the
    * diff join just partitioned by.
    */
  def changeset(v1: DataFrame, v2: DataFrame,
                key: String = "doc_id"): DataFrame = {
    require(v1.columns.sorted.sameElements(v2.columns.sorted),
      "changeset requires identical release schemas")
    val payload = v1.columns.filterNot(_ == key)
    def hashed(v: DataFrame, as: String): DataFrame =
      v.select(col(key), xxhash64(payload.map(col): _*).as(as))
    val d = hashed(v1, "__h1").join(hashed(v2, "__h2"), Seq(key), "full_outer")
    val upsertKeys = d.filter(col("__h2").isNotNull &&
        (col("__h1").isNull || col("__h1") =!= col("__h2")))
      .select(col(key))
    val upserts = v2.join(upsertKeys, Seq(key), "left_semi")
      .withColumn(TombstoneCol, lit(false))
    val tombs = d.filter(col("__h2").isNull).select(
      col(key) +:
        payload.map(c => lit(null).cast(v1.schema(c).dataType).as(c)) :+
        lit(true).as(TombstoneCol): _*)
    upserts.unionByName(tombs)
  }

  private[graft] def layoutRoot(s: SparkSession, corpusDir: String): String =
    CorpusLayout.layoutRoot(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"${CorpusLayout.ConfKey} is not set on this session — no layout to apply into"))

  /** Apply a changeset to a corpus table served by the bucketed
    * [[CorpusLayout]], producing a NEW bucketed generation — the
    * end-to-end incremental corpus refresh:
    *
    *  1. the target is the served bucketed table, so the anti-join's
    *     corpus side reads pre-partitioned — zero Exchange on it whether
    *     the changeset broadcasts (day-sized feed) or sort-merges;
    *  2. the merged corpus writes under `$base/$corpusKey/<table>_vN`
    *     with the SAME bucketBy spec, then the catalog table swings to
    *     the new path — `Tables.load` consumers pick up v(N) on their
    *     next plan, and every id-keyed join downstream stays bucketed;
    *  3. previous generation files are never deleted here (in-flight
    *     plans resolved their paths at construction — the
    *     VectorIndexStore versioning recipe); reclaim old `_vN` dirs
    *     once readers drain, or via [[CorpusLayout.drop]].
    *
    * The catalog flip is DROP + CREATE (Spark's catalog has no atomic
    * table swap): a reader planning in that window falls back to
    * `Tables.load`'s raw-parquet path — stale by one apply, never
    * broken. Returns the new generation's path.
    */
  def applyToLayout(s: SparkSession, corpusDir: String, changes: DataFrame,
                    table: String = "documents",
                    buckets: Int = CorpusLayout.DefaultBuckets): String = {
    val keyCol = CorpusLayout.keyed.getOrElse(table,
      throw new IllegalArgumentException(
        s"table '$table' has no bucketed layout key (CorpusLayout.keyed)"))
    val t = CorpusLayout.tableName(table, corpusDir)
    val target = CorpusLayout.ifPresent(s, corpusDir, table).getOrElse(
      throw new IllegalStateException(
        s"no bucketed layout for ($corpusDir, $table) — run CorpusLayout.materialize first"))
    val base = layoutRoot(s, corpusDir)
    // next generation number: scan existing <table>_vN siblings (the base
    // build lives at <table>, generation 0)
    val root = java.nio.file.Paths.get(base)
    val next = {
      val kids = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        val prefix = s"${table}_v"
        kids.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith(prefix) && n.drop(prefix.length).nonEmpty &&
            n.drop(prefix.length).forall(_.isDigit))
          .map(_.drop(prefix.length).toInt)
          .foldLeft(0)(math.max) + 1
      } finally kids.close()
    }
    val vpath = s"$base/${table}_v$next"
    // materialize the merged corpus BEFORE dropping the table the plan
    // reads from (the SignatureStore.mergeComponents discipline) — here
    // the write itself is the materialization, and it lands in a fresh
    // path the source table never served, so no read-under-write either
    applyChanges(target, changes, keyCol)
      .write.format("parquet").option("path", vpath)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .mode("overwrite").saveAsTable(s"${t}_staging")
    // swing the catalog name to the new generation's files
    s.sql(s"DROP TABLE IF EXISTS $t")
    s.sql(s"ALTER TABLE ${t}_staging RENAME TO $t")
    // bump the layout epoch so OTHER sessions' cached relations (a
    // foreachBatch clone ran this swing; the driver session is still
    // holding the old generation's resolved plan) refresh on next read
    CorpusLayout.bumpEpoch(s, corpusDir, table, vpath)
    vpath
  }
}
