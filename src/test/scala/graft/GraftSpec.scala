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
    // rows-only queries are the deliberate exceptions (approx sketches etc.)
    // — any new oracle-less query must be added here consciously.
    val allowed = Set("q24_approx_distinct")
    assert(missing.forall(q => allowed.contains(q.name)),
      s"queries without an oracle beyond the allowlist: ${missing.map(_.name).filterNot(allowed).mkString(",")}")
  }
}
