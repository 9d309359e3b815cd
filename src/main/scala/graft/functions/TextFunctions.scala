package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-pipeline column DSL (SURVEY.md §2.C).
  *
  * Everything here composes built-in codegen'd functions — no UDFs — so the
  * whole text pipeline stays inside WholeStageCodegen and scales linearly
  * with input bytes. Hash discipline: a cross-engine-portable 64-bit hash
  * derived from md5 (identical in Spark and DuckDB, see SURVEY.md §6),
  * because engine-native hashes (xxhash64 vs DuckDB's) don't agree.
  */
object TextFunctions {

  /** Whitespace tokens of a clean text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable 64-bit hash: first 60 bits of md5 as a non-negative long.
    * DuckDB equivalent: CAST('0x' || substr(md5(s),1,15) AS BIGINT).
    */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant for independent hash families. Seed is mixed into the
    * input, so each seed is an independent md5 draw. (One md5 per seed —
    * for minhash-style families prefer one [[hash64]] + [[permHash]].)
    */
  def hash64Seeded(c: Column, seed: Int): Column =
    hash64(concat(lit(s"s$seed:"), c))

  /** Universal-hash permutation family over a base [[hash64]] value:
    * h_p = (a_p·(h mod P1) + b_p) mod P1 with P1 prime < 2^30, a true
    * affine permutation of Z_P1. The product stays < 2^60, so every
    * intermediate fits in a signed 64-bit integer — identical arithmetic
    * in Spark and DuckDB (whose BIGINT overflow errors instead of
    * wrapping). The reduction MUST be mod P1: an earlier mod-2^61 variant
    * never wrapped, making every "permutation" monotonic in the same value
    * — all minhashes picked the same shingle and LSH recall collapsed to a
    * single hash function's. One md5 feeds any number of permutations.
    */
  val PermP1 = 1073741789L
  def permA(p: Int): Long = (1103515245L * (p + 1) + 12345L) % PermP1
  def permB(p: Int): Long = (694367L * (p + 1) + 99991L) % PermP1
  def permHash(h: Column, p: Int): Column =
    (lit(permA(p)) * (h % PermP1) + lit(permB(p))) % PermP1

  /** DuckDB mirror of [[permHash]] with `h`/`p` spliced as SQL text. */
  def permHashSql(h: String, p: String): String =
    s"(((1103515245*($p+1)+12345) % 1073741789) * ($h % 1073741789) + ((694367*($p+1)+99991) % 1073741789)) % 1073741789"

  /** k-token shingles ("n-grams of tokens") as an array column, via the
    * codegen'd [[ShingleExpr]] (the higher-order-function formulation runs
    * the lambda interpreted and is ~20× slower).
    */
  def shingles(toks: Column, k: Int = 3): Column =
    ShingleExpr.shinglesFast(toks, k)

  /** Count of tokens drawn from a fixed word list. */
  def countIn(toks: Column, words: Seq[String]): Column = {
    val set = words.toSet
    size(filter(toks, t => t.isInCollection(set)))
  }

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set — "exact dedup after canonicalization" key.
    */
  def setFingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** Shared MinHash-LSH parameters — the batch (operators.Dedup) and
    * streaming (streaming.StreamingDedup) pipelines must agree bit-for-bit
    * or the streaming-equals-batch spec fails with a confusing recall
    * message instead of a compile error.
    */
  object MinHashParams {
    val NumPerms = 16
    val NumBands = 4
    val RowsPerBand = 4
  }
}
