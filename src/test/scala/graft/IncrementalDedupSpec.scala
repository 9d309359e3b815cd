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

    // the documented nightly flow end-to-end: processBatch output carries
    // (i, j, est_jaccard) and feeds mergeComponents DIRECTLY — the label
    // merge must accept the 3-column frame and equal a full rebuild
    val labels1 = graft.operators.Dedup.starComponents(w1.select("i", "j"))._1
    val mergedLabels = IncrementalDedup.mergeComponents(labels1, w2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuiltLabels = graft.operators.Dedup.starComponents(
      w1.select("i", "j").unionByName(w2.select("i", "j")))._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mergedLabels == rebuiltLabels,
      "mergeComponents over raw processBatch output diverged from rebuild")
    w1.unpersist(); w2.unpersist()

    // replayed wave: store already has these doc_ids → no pairs, no growth
    val sizeBefore = spark.read.parquet(store).count()
    val w3 = IncrementalDedup.processBatch(docs.filter($"doc_id" < 250), store)
    assert(w3.count() == 0, "replayed batch re-emitted pairs")
    w3.unpersist()
    assert(spark.read.parquet(store).count() == sizeBefore,
      "replayed batch grew the signature store")
  }
  /** Incremental component maintenance must equal a full rebuild EXACTLY:
    * the labeling is its own star edge set, so converging (stars ∪ new
    * pairs) reproduces components of (old graph ∪ new pairs) — including
    * the hard cases: a new pair BRIDGING two existing components, chains
    * of brand-new nodes, a new node with a smaller id than its
    * component's current label (the label must move), self-loops and
    * duplicate edges.
    */
  test("mergeComponents == full rebuild: bridges, new nodes, label-stealing newcomers") {
    import spark.implicits._
    def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deterministic random multigraphs in two waves, 3 seeds
    for (seed <- Seq(5, 17, 41)) {
      val rnd = new scala.util.Random(seed)
      // wave 1 over nodes 100..219; wave 2 adds nodes 10..59 (SMALLER ids
      // — new nodes must be able to steal the min label) and bridges
      val wave1 = (1 to 150).map(_ =>
        (100L + rnd.nextInt(120), 100L + rnd.nextInt(120))).toDF("i", "j")
      val wave2 = ((1 to 60).map(_ =>
        (10L + rnd.nextInt(50), 100L + rnd.nextInt(120))) ++
        (1 to 20).map(_ => (10L + rnd.nextInt(50), 10L + rnd.nextInt(50))))
        .toDF("i", "j")
      val labels1 = graft.operators.Dedup.starComponents(wave1)._1
      val merged = labelsOf(graft.operators.IncrementalDedup
        .mergeComponents(labels1, wave2))
      val rebuilt = labelsOf(
        graft.operators.Dedup.starComponents(wave1.unionByName(wave2))._1)
      assert(merged == rebuilt, s"seed=$seed: incremental merge diverged from rebuild")
    }
    // untouched components stream through with their labels intact
    val w1 = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("i", "j")
    val w2 = Seq((2L, 3L)).toDF("i", "j") // touches {1,2} and {3,4} only
    val l1 = graft.operators.Dedup.starComponents(w1)._1
    val m = labelsOf(graft.operators.IncrementalDedup.mergeComponents(l1, w2))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("store mergeComponents: nightly pairs fold into the served component facet") {
    import spark.implicits._
    assert(spark.conf.getOption(graft.operators.SignatureStore.ConfKey).isEmpty)
    val base = java.nio.file.Files.createTempDirectory("graft_inc_comp").toString
    spark.conf.set(graft.operators.SignatureStore.ConfKey, base)
    // the store facet must be the same family the inline rebuild uses —
    // this test compares against inline d08-style components (perm16)
    spark.conf.set(graft.operators.SignatureStore.FamilyKey, "perm16")
    try {
      graft.operators.SignatureStore.materialize(spark, sf)
      val before = graft.operators.SignatureStore
        .componentsIfPresent(spark, sf).get.count()
      // nightly delta: pretend two fresh docs duplicate two stored ones —
      // their pairs arrive from processBatch; here planted directly
      val docs = Tables.load(spark, sf, "documents")
        .select($"doc_id").orderBy($"doc_id").limit(2)
        .collect().map(_.getLong(0))
      val newPairs = Seq((docs(0), 900001L), (docs(1), 900002L),
        (900001L, 900002L)).map { case (a, b) =>
          (math.min(a, b), math.max(a, b)) }.toDF("i", "j")
      graft.operators.SignatureStore.mergeComponents(spark, sf, newPairs)
      graft.operators.Dedup.releaseSignatures()
      val after = graft.operators.SignatureStore
        .componentsIfPresent(spark, sf).get
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after.size >= before, "merge lost component rows")
      // the three-way bridge united both stored docs' components with the
      // two new nodes under one label — the min id across all four
      val united = Set(docs(0), docs(1), 900001L, 900002L)
      val lbls = united.map(after)
      assert(lbls.size == 1 && lbls.head == united.min,
        s"bridge did not unify: ${united.map(n => n -> after(n))}")
    } finally {
      graft.operators.SignatureStore.drop(spark, sf)
      spark.conf.unset(graft.operators.SignatureStore.ConfKey)
      spark.conf.unset(graft.operators.SignatureStore.FamilyKey)
      graft.operators.Dedup.releaseSignatures()
    }
  }
}
