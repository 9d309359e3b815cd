package graft.operators

import graft.Tables
import graft.GQuery.roundz
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized IVF index — the production/serving form of the s04/s06/
  * s08/s17 vector family (SURVEY §2.E), mirroring [[SignatureStore]]'s
  * discipline on the embedding side.
  *
  * Inline, every probe query recomputes centroids (a full corpus agg) and
  * every vector's nearest-centroid assignment (corpus × k scoring) before
  * it can scan a cell. At 100 TB you do that ONCE: write the k×d centroid
  * table and the per-vector cell assignment next to the corpus, with the
  * assignment **partitioned by cell** — then a probe query reads ONLY the
  * nprobe/k slice of the corpus off disk. The cell filter lands in the
  * scan's PartitionFilters (pinned by VectorIndexStoreSpec), which is the
  * physical form of "IVF visits nprobe cells": file-level skipping, not a
  * post-scan filter. This is exactly how s06's Scaladoc says the operator
  * deploys ("corpus partitioned by cell → partition-pruned scan") — the
  * store makes that claim runnable instead of rhetorical.
  *
  * Same opt-in/refresh contract as [[SignatureStore]]: [[ConfKey]] names
  * a base directory; the driver's Verify gate never sets it, so the
  * DuckDB oracle keeps exercising the real inline pipeline; refresh is
  * the caller's responsibility and keys on the corpus path.
  */
object VectorIndexStore {

  /** Session conf holding the store base directory; unset = inline. */
  val ConfKey = "spark.graft.vecindex.dir"

  private def corpusKey(corpusDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Store directory for a corpus, if the session opted in. */
  def storeDir(s: SparkSession, corpusDir: String): Option[String] =
    s.conf.getOption(ConfKey).map(b => s"$b/${corpusKey(corpusDir)}")

  private def ready(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))

  /** Inline centroid table: per-label element-wise means (s04's form —
    * k×d doubles, always broadcast-able).
    */
  def centroidFrame(s: SparkSession, corpusDir: String): DataFrame =
    Similarity.centroids(
      Tables.load(s, corpusDir, "embeddings"))

  /** Inline cell assignment for EVERY vector: nearest centroid by the
    * family's shared (roundz(cos,4) DESC, c_label ASC) order — identical
    * to the assignment s06 computes on the fly, but corpus-wide and
    * query-independent (an index property, so it can be materialized).
    */
  def assignmentFrame(s: SparkSession, corpusDir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(s, corpusDir, "embeddings")
    val cent = centroidFrame(s, corpusDir)
    val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"c_label".asc)
    e.join(broadcast(cent))
      .select($"vec_id", $"embedding", $"c_label",
        roundz(cosineSim($"embedding", $"centroid"), 4).as("cos"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"embedding", $"c_label".as("cell"))
  }

  /** Build (or rebuild) the store: the tiny centroid table as plain
    * parquet, the assignment partitioned by cell (one directory per
    * cell — the unit the probe path prunes on). Requires [[ConfKey]].
    */
  def materialize(s: SparkSession, corpusDir: String): String = {
    val dir = storeDir(s, corpusDir).getOrElse(throw new IllegalStateException(
      s"$ConfKey is not set on this session — nowhere to materialize"))
    centroidFrame(s, corpusDir)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    // batch_id = -1 marks the base build; streamed appends land under
    // their own (cell, batch_id) leaves so replays overwrite in place
    // (see appendAssignments). cell stays the TOP partition level — the
    // probe's pruning unit.
    assignmentFrame(s, corpusDir)
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("cell", "batch_id")
      .parquet(s"$dir/assignments")
    dir
  }

  /** Store facets, when materialized. */
  def centroidsIfPresent(s: SparkSession, corpusDir: String): Option[DataFrame] =
    storeDir(s, corpusDir).map(d => s"$d/centroids").filter(ready)
      .map(s.read.parquet(_))

  def assignmentsIfPresent(s: SparkSession, corpusDir: String): Option[DataFrame] =
    storeDir(s, corpusDir).map(d => s"$d/assignments").filter(ready)
      .map(s.read.parquet(_).drop("batch_id"))

  /** Store-read IVF probe: top-k by exact cosine among the vectors whose
    * cell is one of the query's `nprobe` nearest centroid cells — s06's
    * semantics served FROM the store. The two scale properties:
    *
    *  - centroid ranking touches only the k-row centroid parquet;
    *  - the assignment scan carries `cell IN (probes)` as a PARTITION
    *    filter — Spark enumerates the matching cell directories and the
    *    non-probed (k − nprobe)/k of the corpus is never read.
    *
    * `probes` is collected driver-side deliberately: it is nprobe cell
    * ids (k-bounded metadata, the same class of driver state as s06's
    * broadcast probe list), and inlining the ids as literals is what
    * lets the scan prune STATICALLY, before any join runs.
    */
  def probe(s: SparkSession, corpusDir: String, queryVecId: Long,
            nprobe: Int = 2, topK: Int = 5): DataFrame = {
    import s.implicits._
    val q = Tables.load(s, corpusDir, "embeddings")
      .filter($"vec_id" === queryVecId)
      .select(asDouble($"embedding").as("qv"))
    val cent = centroidsIfPresent(s, corpusDir).getOrElse(
      throw new IllegalStateException(s"no materialized index under $ConfKey"))
    val probes = cent.join(broadcast(q))
      .select($"c_label", roundz(cosineSim($"centroid", $"qv"), 4).as("qcos"))
      .orderBy($"qcos".desc, $"c_label".asc).limit(nprobe)
      .select($"c_label").as[Int].collect().toSeq
    assignmentsIfPresent(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"index under $ConfKey has centroids but no assignments — " +
          "materialize() incomplete or still running"))
      .filter($"cell".isin(probes: _*) && $"vec_id" =!= queryVecId)
      .join(broadcast(q))
      .select($"vec_id", $"cell",
        roundz(cosineSim($"embedding", $"qv"), 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc)
      .limit(topK)
  }

  /** Store-read IVF probe for a query WORKLOAD — s08's batch shape served
    * FROM the store, where [[probe]] serves one vector per call. `queries`
    * is a (query_id, qv) frame; each query explodes to its `nprobe`
    * nearest centroid cells (ranked against the k-row centroid parquet,
    * broadcast), candidates come from an EQUALITY join on the cell id,
    * and each query keeps its exact-cosine top-`topK`.
    *
    * The scale property, same as [[probe]]'s but workload-wide: the UNION
    * of probed cells (≤ |queries|×nprobe ids, k-bounded metadata — the
    * same class of driver state as probe()'s nprobe collect) is inlined
    * as literals, so the cell-partitioned assignment scan prunes
    * STATICALLY — selected partitions == |probed cells|, spec-pinned.
    * The corpus side never shuffles: the probe frame broadcasts onto it.
    *
    * `corpusPredicate` optionally restricts the candidate corpus (tenant
    * or recency filters; the spec uses it to reproduce s08's corpus
    * split exactly).
    */
  def probeBatch(s: SparkSession, corpusDir: String, queries: DataFrame,
                 nprobe: Int = 2, topK: Int = 3,
                 corpusPredicate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cent = centroidsIfPresent(s, corpusDir).getOrElse(
      throw new IllegalStateException(s"no materialized index under $ConfKey"))
    val wProbe = Window.partitionBy($"query_id").orderBy($"qcos".desc, $"c_label".asc)
    val qprobe = queries
      .join(broadcast(cent))
      .select($"query_id", $"qv", $"c_label",
        roundz(cosineSim($"qv", $"centroid"), 4).as("qcos"))
      .withColumn("rn", row_number().over(wProbe)).filter($"rn" <= nprobe)
      .select($"query_id", $"qv", $"c_label".as("cell"))
    val cells = qprobe.select($"cell").distinct().as[Int].collect().toSeq
    val assign0 = assignmentsIfPresent(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"index under $ConfKey has centroids but no assignments — " +
          "materialize() incomplete or still running"))
      .filter($"cell".isin(cells: _*))
    val assign = corpusPredicate.fold(assign0)(assign0.filter)
    val wRank = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    assign.join(broadcast(qprobe), "cell")
      .select($"query_id", $"vec_id",
        roundz(cosineSim($"embedding", $"qv"), 4).as("cos"))
      .withColumn("rn", row_number().over(wRank)).filter($"rn" <= topK)
      .select($"query_id", $"rn", $"vec_id", $"cos")
      .orderBy($"query_id", $"rn")
  }

  /** Assign NEW vectors against the FROZEN stored centroids and append
    * them to the cell-partitioned assignment — the serving-time index
    * update (the IVF analog of [[SignatureStore.appendTable]]'s
    * contract): centroids are an index property you retrain offline;
    * between retrains, arriving vectors route to existing cells, each
    * append touching only the cell directories its vectors land in.
    * Because assignment is a pure function of (vector, centroids),
    * append ≡ rebuild for the same centroid generation — spec-pinned.
    *
    * REPLAY-IDEMPOTENT by construction (ParquetSink.writeBatch's recipe):
    * every append carries a `batchId` and lands in its own
    * (cell, batch_id) leaves under dynamic partition overwrite, so a
    * recovered/replayed micro-batch REPLACES its previous attempt instead
    * of double-inserting beside it. The batch id is the idempotency key;
    * no manifest or compaction needed, and cell-level pruning is
    * untouched (cell stays the top partition level).
    *
    * `newVecs`: (vec_id, embedding) rows not yet in the index.
    */
  def appendAssignments(s: SparkSession, corpusDir: String,
                        newVecs: DataFrame, batchId: Long): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dir = storeDir(s, corpusDir).getOrElse(throw new IllegalStateException(
      s"$ConfKey is not set on this session — nowhere to append"))
    val cent = centroidsIfPresent(s, corpusDir).getOrElse(
      throw new IllegalStateException(s"no materialized index under $ConfKey"))
    val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"c_label".asc)
    newVecs
      .join(broadcast(cent))
      .select($"vec_id", $"embedding", $"c_label",
        roundz(cosineSim($"embedding", $"centroid"), 4).as("cos"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"embedding", $"c_label".as("cell"))
      .withColumn("batch_id", lit(batchId))
      // per-WRITE dynamic mode: overwrite touches only the (cell,
      // batch_id) leaves present in this batch, never the whole table —
      // and the session's global overwrite mode is left alone
      .write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("cell", "batch_id")
      .parquet(s"$dir/assignments")
  }

  /** Drop the store for a corpus (files only; no catalog state).
    * deleteIfExists + closed directory streams: tolerant of concurrent
    * cleanup and leak-free on deep trees.
    */
  def drop(s: SparkSession, corpusDir: String): Unit =
    storeDir(s, corpusDir).foreach { d =>
      val root = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(root)) {
        def rm(p: java.nio.file.Path): Unit = {
          if (java.nio.file.Files.isDirectory(p)) {
            val children = java.nio.file.Files.list(p)
            try children.forEach(rm(_)) finally children.close()
          }
          java.nio.file.Files.deleteIfExists(p)
        }
        rm(root)
      }
    }
}
