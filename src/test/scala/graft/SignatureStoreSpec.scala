package graft

import graft.operators.{Dedup, SignatureStore}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The materialized signature/component store must be a pure plan swap:
  * identical results (bit-level, via Row rendering — signed zero and all)
  * for every consumer, with the consumer's plan actually scanning the
  * store parquet instead of recomputing the minhash pipeline.
  */
class SignatureStoreSpec extends AnyFunSuite with SparkTestBase {

  // one consumer per store facet: d02 (signatures, pair join), d08
  // (components), p16 (signatures via minhashPairs), p06 (components +
  // representative selection)
  private val consumers = Seq(
    "d02_minhash_lsh", "d08_dup_components", "p16_split_leakage",
    "p06_cluster_representative")

  private def runAll(): Map[String, Seq[String]] = consumers.map { n =>
    Dedup.releaseSignatures()
    n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
  }.toMap

  test("store-read equals inline bit-for-bit and swaps the scan into the plan") {
    assert(spark.conf.getOption(SignatureStore.ConfKey).isEmpty,
      "test precondition: session must start without a store conf")
    val inline = runAll()
    val base = java.nio.file.Files.createTempDirectory("graft_sigstore").toString
    spark.conf.set(SignatureStore.ConfKey, base)
    try {
      val dir = SignatureStore.materialize(spark, sf)
      val key = dir.substring(dir.lastIndexOf('/') + 1)
      val viaStore = runAll()
      consumers.foreach { n =>
        assert(viaStore(n) == inline(n), s"$n: store-read diverged from inline")
      }
      // the plan consumes the store: its corpus-keyed path appears among
      // the scan relations (LogicalRelation text elides paths, so inspect
      // the file indices directly)
      def relPaths(rel: Any): Seq[String] = rel match {
        case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          f.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
      def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            relPaths(l.relation)
          // Dedup caches the signature frame, so the store scan hides
          // inside the InMemoryRelation's cached physical plan
          case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            m.cachedPlan.collect {
              case f: org.apache.spark.sql.execution.FileSourceScanExec =>
                f.relation.location.rootPaths.map(_.toString)
            }.flatten
        }.flatten
      Dedup.releaseSignatures()
      val d02Paths = scanPaths(SparkEntry.queries("d02_minhash_lsh")(spark, sf))
      assert(d02Paths.exists(_.contains(key)),
        s"d02 plan does not scan the materialized store: $d02Paths")
      // components facet: d08 reads the converged labels as a parquet scan
      Dedup.releaseSignatures()
      val d08Paths = scanPaths(SparkEntry.queries("d08_dup_components")(spark, sf))
      assert(d08Paths.exists(p => p.contains(key) && p.contains("components")),
        s"d08 plan does not scan the materialized component store: $d08Paths")
    } finally {
      spark.conf.unset(SignatureStore.ConfKey)
      Dedup.releaseSignatures()
    }
  }

  test("table-format store: results equal inline, store-side joins shuffle-free") {
    assert(spark.conf.getOption(SignatureStore.ConfKey).isEmpty,
      "test precondition: session must start without a store conf")
    val inline = runAll()
    val base = java.nio.file.Files.createTempDirectory("graft_sigstore_t").toString
    spark.conf.set(SignatureStore.ConfKey, base)
    try {
      val (sigT, compT) = SignatureStore.materializeTable(spark, sf)
      assert(spark.catalog.tableExists(sigT) && spark.catalog.tableExists(compT))
      // pure plan swap: every consumer reads the bucketed tables (the
      // catalog hook wins over the parquet-dir facet) yet renders the
      // identical rows, signed zeros and all
      val viaTable = runAll()
      consumers.foreach { n =>
        assert(viaTable(n) == inline(n), s"$n: table-store read diverged from inline")
      }
      // the bucketing payoff: signatures ⋈ components on the doc id —
      // both tables bucketed+sorted the same way — plans with ZERO
      // Exchange. The merge hint keeps AQE from broadcasting the (tiny at
      // test SF) component side, which would skip bucketing entirely; at
      // corpus scale both sides are large and sort-merge is the real plan.
      val joined = spark.table(sigT).hint("merge")
        .join(spark.table(compT), col("doc_id") === col("node"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"store-side join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join over buckets")
      assert(joined.count() > 0, "store join produced no rows")
    } finally {
      SignatureStore.drop(spark, sf)
      spark.conf.unset(SignatureStore.ConfKey)
      Dedup.releaseSignatures()
    }
  }

  test("append-table: batch append equals a full rebuild, bit for bit") {
    import spark.implicits._
    assert(spark.conf.getOption(SignatureStore.ConfKey).isEmpty)
    val base = java.nio.file.Files.createTempDirectory("graft_sigstore_a").toString
    spark.conf.set(SignatureStore.ConfKey, base)
    try {
      val docs = Tables.load(spark, sf, "documents")
      val sigT = SignatureStore.tableName("sig", sf)
      // day 0: the even half bootstraps the table; day 1: the odd half
      // lands as a nightly batch
      SignatureStore.appendTable(spark, sf, docs.filter($"doc_id" % 2 === 0))
      SignatureStore.appendTable(spark, sf, docs.filter($"doc_id" % 2 === 1))
      val viaStore = spark.table(sigT).orderBy($"doc_id")
        .collect().map(_.toString).toSeq
      val full = Dedup.signatureFrame(docs).orderBy($"doc_id")
        .collect().map(_.toString).toSeq
      assert(viaStore == full, "appended store diverged from a full rebuild")
      // appended files keep the bucket layout: a doc_id-keyed aggregate
      // over the table plans without a shuffle exchange
      val agg = spark.table(sigT).groupBy($"doc_id").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"append broke the bucket layout — doc_id aggregate shuffles:\n$plan")
    } finally {
      SignatureStore.drop(spark, sf)
      spark.conf.unset(SignatureStore.ConfKey)
      Dedup.releaseSignatures()
    }
  }

  test("materialize without the conf fails loudly; drop removes the store") {
    assert(spark.conf.getOption(SignatureStore.ConfKey).isEmpty)
    intercept[IllegalStateException](SignatureStore.materialize(spark, sf))
    val base = java.nio.file.Files.createTempDirectory("graft_sigstore_d").toString
    spark.conf.set(SignatureStore.ConfKey, base)
    try {
      val dir = SignatureStore.materialize(spark, sf)
      assert(SignatureStore.signaturesIfPresent(spark, sf).isDefined)
      SignatureStore.drop(spark, sf)
      assert(SignatureStore.signaturesIfPresent(spark, sf).isEmpty,
        "drop left a readable store behind")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    } finally {
      spark.conf.unset(SignatureStore.ConfKey)
      Dedup.releaseSignatures()
    }
  }
}
