package graft

import graft.operators.{Dedup, SignatureStore}
import graft.sources.CorpusLayout
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed corpus layout must be a pure read swap: identical rows
  * through Tables.load, identical operator results, and the promised
  * zero-Exchange id-keyed joins once both sides are bucketed.
  */
class CorpusLayoutSpec extends AnyFunSuite with SparkTestBase {

  test("layout read equals raw parquet; consumers are unchanged; joins co-locate") {
    import spark.implicits._
    assert(spark.conf.getOption(CorpusLayout.ConfKey).isEmpty,
      "test precondition: session must start without a layout conf")
    // raw-path results before any table exists
    val rawDocs = Tables.load(spark, sf, "documents")
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    val rawD01 = SparkEntry.queries("d01_exact_dedup")(spark, sf)
      .collect().map(_.toString).toSeq
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    spark.conf.set(CorpusLayout.ConfKey, base)
    try {
      val tables = CorpusLayout.materialize(spark, sf)
      assert(tables.forall(spark.catalog.tableExists))
      // Tables.load now serves the bucketed tables — same rows, bit for bit
      val viaLayout = Tables.load(spark, sf, "documents")
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      assert(viaLayout == rawDocs, "bucketed layout changed document rows")
      // an operator over the layout renders identical results
      val d01 = SparkEntry.queries("d01_exact_dedup")(spark, sf)
        .collect().map(_.toString).toSeq
      assert(d01 == rawD01, "d01 diverged when reading the bucketed layout")
      // documents ⋈ embeddings on the id key: both bucketed the same way,
      // so the merge join plans with ZERO Exchange
      val docT = CorpusLayout.tableName("documents", sf)
      val embT = CorpusLayout.tableName("embeddings", sf)
      val j = spark.table(docT).hint("merge")
        .join(spark.table(embT), col("doc_id") === col("vec_id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"corpus-layout join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join over buckets")
      assert(j.count() > 0)
      // the full co-location story: corpus ⋈ signature store, both
      // bucketed on doc_id — the join every dedup consumer runs at scale
      spark.conf.set(SignatureStore.ConfKey, base)
      val (sigT, _) = SignatureStore.materializeTable(spark, sf)
      val j2 = spark.table(docT).hint("merge")
        .join(spark.table(sigT), Seq("doc_id"))
      val plan2 = j2.queryExecution.executedPlan.toString
      assert(!plan2.contains("Exchange"), s"corpus ⋈ signatures still shuffles:\n$plan2")
      assert(j2.count() > 0)
    } finally {
      SignatureStore.drop(spark, sf)
      CorpusLayout.drop(spark, sf)
      spark.conf.unset(SignatureStore.ConfKey)
      spark.conf.unset(CorpusLayout.ConfKey)
      Dedup.releaseSignatures()
    }
  }

  test("materialize without the conf fails; drop removes tables and files") {
    assert(spark.conf.getOption(CorpusLayout.ConfKey).isEmpty)
    intercept[IllegalStateException](CorpusLayout.materialize(spark, sf))
    val base = java.nio.file.Files.createTempDirectory("graft_layout_d").toString
    spark.conf.set(CorpusLayout.ConfKey, base)
    try {
      CorpusLayout.materialize(spark, sf)
      assert(CorpusLayout.ifPresent(spark, sf, "documents").isDefined)
      CorpusLayout.drop(spark, sf)
      assert(CorpusLayout.ifPresent(spark, sf, "documents").isEmpty,
        "drop left a readable layout behind")
    } finally {
      spark.conf.unset(CorpusLayout.ConfKey)
    }
  }
}
