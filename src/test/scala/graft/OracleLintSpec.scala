package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static parity lint: the driver's compare sorts columns BY NAME before
  * hashing, so a Spark column that the oracle SQL aliases differently
  * fails the gate even with identical values. This spec catches alias
  * drift at test time: every output column of every oracled query must
  * appear as a word in its oracle SQL, and every oracle must carry a
  * total ORDER BY (or be a provably 1-row aggregate).
  */
class OracleLintSpec extends AnyFunSuite with SparkTestBase {

  test("every output column name appears in the oracle SQL") {
    SparkEntry.allQueries.filter(_.oracle.isDefined).foreach { q =>
      val cols = q.run(spark, sf).schema.fieldNames
      val sql = q.oracle.get.toLowerCase
      val missing = cols.filterNot(c =>
        ("""\b""" + java.util.regex.Pattern.quote(c.toLowerCase) + """\b""").r
          .findFirstIn(sql).isDefined)
      assert(missing.isEmpty, s"${q.name}: columns ${missing.mkString(",")} not named in oracle SQL")
    }
  }

  test("every oracle is deterministically ordered") {
    // single-row aggregates: no ordering needed
    val exempt = Set("e03_funnel", "d15_dup_rate_estimate")
    SparkEntry.allQueries.filter(_.oracle.isDefined).foreach { q =>
      val sql = q.oracle.get.toLowerCase
      assert(exempt.contains(q.name) || sql.contains("order by"),
        s"${q.name}: oracle has no ORDER BY")
    }
  }
}
