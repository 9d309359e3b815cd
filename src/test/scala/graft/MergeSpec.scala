package graft

import graft.operators.MergeOps
import graft.sources.CorpusLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MergeOps: the CDC MERGE apply verb. Pins (1) the defining law
  * apply(v1, changeset(v1, v2)) ≡ v2 row-for-row on the real corpus,
  * (2) MERGE-clause micro-semantics incl. unmatched-tombstone no-op and
  * replay idempotency, (3) changeset minimality, (4) the zero-Exchange
  * apply over the bucketed CorpusLayout and the versioned applyToLayout
  * generation flip.
  */
class MergeSpec extends AnyFunSuite with SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col): _*).collect().map(_.toString).toSeq

  test("apply(v1, changeset(v1, v2)) reproduces v2 row-for-row") {
    import spark.implicits._
    val v1 = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"n_chars".cast("long").as("n_bytes"))
    // p26's release-2 scenario: drops, re-crawls, and negative-axis adds
    val v2 = Tables.load(spark, sf, "documents").filter($"doc_id" % 50 =!= 0)
      .select($"doc_id",
        when($"doc_id" % 7 === 0, concat(lit("recrawl-v2 "), $"text"))
          .otherwise($"text").as("text"),
        when($"doc_id" % 7 === 0, $"n_chars" + 11).otherwise($"n_chars")
          .cast("long").as("n_bytes"))
      .unionAll(Tables.load(spark, sf, "documents").filter($"doc_id" % 97 === 0)
        .select((-($"doc_id" + 1L)).cast("long").as("doc_id"),
          concat(lit("new-crawl "), $"text").as("text"),
          ($"n_chars" + 10).cast("long").as("n_bytes")))
    val cs = MergeOps.changeset(v1, v2)
    assert(rows(MergeOps.applyChanges(v1, cs)) == rows(v2),
      "merge apply did not reproduce release 2")
    // minimality: one row per changed/added/removed key, unchanged absent
    val v1n = v1.count(); val v2n = v2.count()
    val removed = v1.join(v2, Seq("doc_id"), "left_anti").count()
    val added = v2.join(v1, Seq("doc_id"), "left_anti").count()
    val changed = v1.join(v2.withColumnRenamed("text", "t2"), Seq("doc_id"))
      .filter($"text" =!= $"t2").count()
    assert(cs.count() == removed + added + changed,
      s"changeset not minimal: ${cs.count()} rows vs $removed+$added+$changed")
    assert(removed > 0 && added > 0 && changed > 0,
      s"scenario degenerate at this SF ($v1n/$v2n docs) — thresholds unexercised")
  }

  test("MERGE clause semantics: update, insert, delete, no-op tombstone, replay") {
    import spark.implicits._
    val target = Seq((1L, "one", 3L), (2L, "two", 3L), (3L, "three", 5L))
      .toDF("doc_id", "text", "n_bytes")
    val changes = Seq(
      (2L, Some("TWO"), Some(30L), false),  // matched upsert → update
      (4L, Some("four"), Some(4L), false),  // unmatched upsert → insert
      (3L, None: Option[String], None: Option[Long], true), // matched tombstone → delete
      (9L, None: Option[String], None: Option[Long], true)) // unmatched tombstone → no-op
      .toDF("doc_id", "text", "n_bytes", "tombstone")
    val once = MergeOps.applyChanges(target, changes)
    assert(rows(once) == rows(Seq((1L, "one", 3L), (2L, "TWO", 30L),
      (4L, "four", 4L)).toDF("doc_id", "text", "n_bytes")))
    // replayable: applying the same changeset to the result is a fixpoint
    assert(rows(MergeOps.applyChanges(once, changes)) == rows(once),
      "changeset replay was not idempotent")
    // contract violations fail loudly, not silently
    intercept[IllegalArgumentException](
      MergeOps.applyChanges(target, changes.drop("tombstone")))
    intercept[IllegalArgumentException](
      MergeOps.applyChanges(target, changes.drop("n_bytes")))
  }

  test("bucketed layout apply: corpus side ships zero Exchange; applyToLayout versions") {
    import spark.implicits._
    assert(spark.conf.getOption(CorpusLayout.ConfKey).isEmpty,
      "test precondition: session must start without a layout conf")
    val base = java.nio.file.Files.createTempDirectory("graft_merge").toString
    spark.conf.set(CorpusLayout.ConfKey, base)
    try {
      CorpusLayout.materialize(spark, sf)
      val target = CorpusLayout.ifPresent(spark, sf, "documents").get
      val changes = Tables.load(spark, sf, "documents").filter($"doc_id" % 5 === 0)
        .select($"doc_id", concat(lit("v2 "), $"text").as("text"), $"lang",
          $"source", ($"n_chars" + 3L).as("n_chars"))
        .withColumn("tombstone", $"doc_id" % 10 === 0)
      // day-sized changeset: broadcast anti-join — the corpus never
      // shuffles and nothing else does either
      val applied = MergeOps.applyChanges(target, changes)
      val planB = applied.queryExecution.executedPlan.toString
      assert(!planB.contains("Exchange hashpartitioning"),
        s"broadcast apply still shuffles:\n$planB")
      // forced sort-merge, changeset derived FROM the bucketed table:
      // both sides co-locate — zero Exchange in the whole apply
      val smj = MergeOps.applyChanges(target.hint("merge"), changes)
      val planS = smj.queryExecution.executedPlan.toString
      assert(planS.contains("SortMergeJoin"), s"merge hint ignored:\n$planS")
      assert(!planS.contains("Exchange hashpartitioning"),
        s"bucket-aligned apply still shuffles:\n$planS")
      // forced sort-merge with an UNBUCKETED changeset (raw parquet — a
      // CDC feed from outside the layout): only the changeset side
      // repartitions; the bucketed corpus side still ships zero Exchange
      val rawChanges = spark.read.parquet(s"$sf/documents.parquet")
        .filter($"doc_id" % 5 === 0)
        .select($"doc_id", concat(lit("v2 "), $"text").as("text"), $"lang",
          $"source", ($"n_chars" + 3L).as("n_chars"))
        .withColumn("tombstone", $"doc_id" % 10 === 0)
      val smjRaw = MergeOps.applyChanges(target.hint("merge"), rawChanges)
      val planR = smjRaw.queryExecution.executedPlan.toString
      assert(planR.contains("SortMergeJoin"), s"merge hint ignored:\n$planR")
      val shuffles = planR.linesIterator
        .count(_.contains("Exchange hashpartitioning"))
      assert(shuffles == 1,
        s"expected exactly the changeset-side Exchange, saw $shuffles:\n$planR")
      // the versioned layout apply: new generation dir, catalog swung,
      // contents ≡ the in-memory apply, bucketing preserved
      val expected = rows(applied.select($"doc_id", $"text", $"n_chars"))
      val vpath = MergeOps.applyToLayout(spark, sf, changes)
      assert(vpath.contains("documents_v1"), s"unexpected generation path $vpath")
      val served = CorpusLayout.ifPresent(spark, sf, "documents").get
      assert(rows(served.select($"doc_id", $"text", $"n_chars")) == expected,
        "served generation diverged from the in-memory apply")
      // post-apply id-keyed joins keep the zero-Exchange property
      val embT = CorpusLayout.tableName("embeddings", sf)
      val j = served.hint("merge")
        .join(spark.table(embT), col("doc_id") === col("vec_id"))
      val planJ = j.queryExecution.executedPlan.toString
      assert(!planJ.contains("Exchange"),
        s"post-apply corpus join shuffles again:\n$planJ")
      assert(j.count() > 0)
      // a second apply lands v2 — generations are append-only
      val vpath2 = MergeOps.applyToLayout(spark, sf, changes)
      assert(vpath2.contains("documents_v2"), s"unexpected generation path $vpath2")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(vpath)),
        "previous generation files deleted under in-flight readers")
    } finally {
      CorpusLayout.drop(spark, sf)
      spark.conf.unset(CorpusLayout.ConfKey)
    }
  }
}
