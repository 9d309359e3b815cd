package graft

import graft.operators.IncrementalDedup
import org.scalatest.funsuite.AnyFunSuite

/** Delta-style incremental dedup: a persistent signature store processed
  * one ingest wave at a time must find exactly the pairs the one-shot
  * batch operator (d02) finds over the full corpus — and a replayed wave
  * (at-least-once ingest) must emit nothing new.
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestBase {

  test("two ingest waves through the signature store equal batch d02") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents").select($"doc_id", $"text")
    val store = java.nio.file.Files.createTempDirectory("graft_incdedup")
      .toString + "/store"
    val w1 = IncrementalDedup.processBatch(docs.filter($"doc_id" < 250), store)
    val w2 = IncrementalDedup.processBatch(docs.filter($"doc_id" >= 250), store)
    val got = (w1.collect() ++ w2.collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = SparkEntry.queries("d02_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "no batch pairs at this sf — test data unusable")
    assert(got == want,
      s"incremental != batch: missing=${(want -- got).size} extra=${(got -- want).size}")
    w1.unpersist(); w2.unpersist()

    // replayed wave: store already has these doc_ids → no pairs, no growth
    val sizeBefore = spark.read.parquet(store).count()
    val w3 = IncrementalDedup.processBatch(docs.filter($"doc_id" < 250), store)
    assert(w3.count() == 0, "replayed batch re-emitted pairs")
    w3.unpersist()
    assert(spark.read.parquet(store).count() == sizeBefore,
      "replayed batch grew the signature store")
  }
}
