package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized MinHash signature/component store — the production form
  * of the d02 pipeline (SURVEY §2.D).
  *
  * Seven operators (d04/d08/d11/d12/p06/p15/p16 + d02 itself) consume the
  * banded-signature frame, and three of those consume the converged
  * duplicate-component labels. Inline, every cold run recomputes
  * tokenize→shingle→md5→16-permutation-min over the whole corpus per
  * consumer — at 100 TB you compute minhashes ONCE, write them next to
  * the corpus, and every dedup/decontamination/sampling job joins the
  * store instead (signatures are per-document and corpus-independent, so
  * the store composes with [[IncrementalDedup]]: nightly batches append
  * the same schema).
  *
  * Opt-in by session conf [[ConfKey]] (a base directory): when set,
  * [[Dedup.signatures]]/[[Dedup.dupComponents]] read a materialized store
  * for the corpus if one exists and fall back inline otherwise. When
  * unset (the default — and the Verify gate's configuration) everything
  * computes inline, which keeps the DuckDB oracle comparison exercising
  * the real pipeline. SignatureStoreSpec pins store-read ≡ inline
  * bit-for-bit.
  *
  * Refresh is the caller's responsibility, like any materialized view:
  * [[materialize]] overwrites; a corpus rewritten in place serves stale
  * signatures until then (the store keys on the corpus PATH).
  */
object SignatureStore {

  /** Session conf holding the store base directory; unset = inline. */
  val ConfKey = "spark.graft.sigstore.dir"

  private def corpusKey(corpusDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Store directory for a corpus, if the session opted in. */
  def storeDir(s: SparkSession, corpusDir: String): Option[String] =
    s.conf.getOption(ConfKey).map(b => s"$b/${corpusKey(corpusDir)}")

  private def ready(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))

  /** The banded-signature frame from the store, when materialized. */
  def signaturesIfPresent(s: SparkSession, corpusDir: String): Option[DataFrame] =
    storeDir(s, corpusDir).map(d => s"$d/signatures").filter(ready)
      .map(s.read.parquet(_))

  /** The converged component labels from the store, when materialized. */
  def componentsIfPresent(s: SparkSession, corpusDir: String): Option[DataFrame] =
    storeDir(s, corpusDir).map(d => s"$d/components").filter(ready)
      .map(s.read.parquet(_))

  /** Build (or rebuild) the store for a corpus: one signature pass, one
    * component convergence, both written as parquet. Requires [[ConfKey]]
    * to be set. Returns the store directory.
    *
    * The component stage deliberately runs AFTER the signature write and
    * a memo flush, so it reads the store it will sit next to — the same
    * plan every consumer gets.
    */
  def materialize(s: SparkSession, corpusDir: String): String = {
    val dir = storeDir(s, corpusDir).getOrElse(throw new IllegalStateException(
      s"$ConfKey is not set on this session — nowhere to materialize"))
    // drop any cached plan still scanning a previous store generation
    Dedup.releaseSignatures()
    Dedup.signatureFrame(Tables.load(s, corpusDir, "documents"))
      .write.mode("overwrite").parquet(s"$dir/signatures")
    Dedup.releaseSignatures()
    // dupComponents now reads the freshly written signatures; its result
    // is a localCheckpoint, so writing it elsewhere is safe
    Dedup.dupComponents(s, corpusDir)
      .write.mode("overwrite").parquet(s"$dir/components")
    Dedup.releaseSignatures()
    dir
  }

  /** Remove the store for a corpus (tests; explicit invalidation). */
  def drop(s: SparkSession, corpusDir: String): Unit =
    storeDir(s, corpusDir).foreach { d =>
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(d))
    }
}
