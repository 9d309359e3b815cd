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

  /** Seeded variant for independent hash families (minhash). Seed is mixed
    * into the input, so each seed is an independent md5 draw.
    */
  def hash64Seeded(c: Column, seed: Int): Column =
    hash64(concat(lit(s"s$seed:"), c))

  /** k-token shingles ("n-grams of tokens") as an array column.
    * 1-based element_at arithmetic matches DuckDB's 1-based list indexing.
    */
  def shingles(toks: Column, k: Int = 3): Column = {
    val idx = sequence(lit(1), greatest(size(toks) - (k - 1), lit(0)))
    val mk = (i: Column) => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)
    when(size(toks) >= k, transform(idx, mk)).otherwise(array())
  }

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
}
