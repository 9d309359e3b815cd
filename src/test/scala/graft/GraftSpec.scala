package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + tiny helpers for all specs. */
trait SparkTestBase { self: AnyFunSuite =>
  lazy val spark: SparkSession = SharedSpark.spark
  val sf: String = "/root/testdata/sf0.001"
}

object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class EntrySpec extends AnyFunSuite with SparkTestBase {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle column discipline and runs") {
    SparkEntry.allQueries.foreach { q =>
      val df = q.run(spark, sf)
      val n = df.count()
      assert(n > 0, s"${q.name} returned no rows at sf0.001")
    }
  }

  test("oracleSql covers every query or is declared rows-only") {
    val missing = SparkEntry.allQueries.filter(q => q.oracle.isEmpty)
    // EVERY query carries an oracle since round 15 (q24, the last
    // rows-only exception, now emits exact count + a within_bound flag
    // DuckDB mirrors) — any new oracle-less query is a regression.
    assert(missing.isEmpty,
      s"queries without an oracle: ${missing.map(_.name).mkString(",")}")
  }
}

/** r14: the `_prepare_python` quirks pinned one by one — each row here was
  * differentially checked against the reference parser itself
  * (`/root/reference/marda_extractors_api/__init__.py:308-346`) before
  * being frozen into this spec.
  */
class CallPlanParseSpec extends AnyFunSuite with SparkTestBase {
  private lazy val rows: Map[Long, Seq[org.apache.spark.sql.Row]] = {
    val df = SparkEntry.queries("r14_call_plan_parse")(spark, sf)
    df.collect().toSeq.groupBy(_.getAs[Long]("cmd_id"))
  }
  private def parts(id: Long, part: String) =
    rows(id).filter(_.getAs[String]("part") == part)

  test("templated real command parses to tree + dequoted positionals") {
    val args = parts(0L, "arg").map(_.getAs[String]("val"))
    assert(rows(0L).head.getAs[String]("fn_head") == "yadg.extractors.extract")
    assert(rows(0L).head.getAs[Int]("fn_depth") == 3)
    assert(args == Seq("biologic-mpr", "/data/files/doc_0.mpr"))
  }

  test("duplicate kwargs last-win (dict.update order)") {
    val kw = parts(9002L, "kwarg")
    assert(kw.map(r => r.getAs[String]("kw_key") -> r.getAs[String]("val")) == Seq("kw" -> "2"))
  }

  test("double '=' and braces raise cannot_parse; no '(' is the IndexError path") {
    assert(parts(9003L, "error").head.getAs[String]("status") == "error:cannot_parse")
    assert(parts(9004L, "error").head.getAs[String]("status") == "error:cannot_parse")
    assert(parts(9010L, "error").head.getAs[String]("status") == "error:cannot_parse")
    assert(parts(9005L, "error").head.getAs[String]("status") == "error:no_call")
  }

  test("'()' yields one empty positional; nested call gross-parses to inner head") {
    assert(parts(9006L, "arg").map(_.getAs[String]("val")) == Seq(""))
    assert(parts(9007L, "arg").map(_.getAs[String]("val")) == Seq("inner.g"))
  }

  test("residual placeholder surfaces as has_residual (r13 composition)") {
    assert(parts(9009L, "arg").exists(_.getAs[Boolean]("has_residual")))
    assert(parts(9008L, "arg").forall(!_.getAs[Boolean]("has_residual")))
  }
}
