package graft

import org.apache.spark.sql.catalyst.expressions.{Add, Expression, Literal, Round}
import org.apache.spark.sql.types.DoubleType
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

  // ── signed-zero lint (round-4 t16 failure class) ──
  // Spark round() goes through BigDecimal (no signed zero → +0.0) while
  // DuckDB ROUND preserves IEEE -0.0; a score rounding to zero from below
  // hashes differently across engines even though `=` compares equal. The
  // fix is `+ 0.0` after the round on BOTH engines (GQuery.roundz / SQL
  // `(ROUND(...) + 0.0)`); these two tests make the pattern mandatory.

  test("every double-typed Spark round() is +0.0-normalized (use GQuery.roundz)") {
    SparkEntry.allQueries.foreach { q =>
      val plan = q.run(spark, sf).queryExecution.analyzed
      def rounds(e: Expression): Seq[Round] =
        e.collect { case r: Round if r.dataType == DoubleType => r }
      def wrapped(e: Expression): Seq[Round] = e.collect {
        case Add(r: Round, Literal(0.0, DoubleType), _) if r.dataType == DoubleType => r
        case Add(Literal(0.0, DoubleType), r: Round, _) if r.dataType == DoubleType => r
      }
      val all = plan.collect { case p => p.expressions.flatMap(rounds) }.flatten
      val norm = plan.collect { case p => p.expressions.flatMap(wrapped) }.flatten
      assert(all.size == norm.size,
        s"${q.name}: ${all.size - norm.size} double round() not +0.0-normalized — use GQuery.roundz")
    }
  }

  test("every oracle ROUND( is followed by + 0.0") {
    def matchingParen(s: String, open: Int): Int = {
      var depth = 0; var j = open
      while (j < s.length) {
        s(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      fail(s"unbalanced parens after offset $open")
    }
    SparkEntry.allQueries.filter(_.oracle.isDefined).foreach { q =>
      val sql = q.oracle.get
      val re = """(?i)\bROUND\(""".r
      re.findAllMatchIn(sql).foreach { m =>
        val close = matchingParen(sql, m.end - 1)
        val rest = sql.drop(close + 1).take(12)
        // `(ROUND(x, s) + 0.0)` normalizes IEEE -0.0 on DOUBLE rounds;
        // `CAST(ROUND(x, s) AS DECIMAL(..))` is the other safe form —
        // decimal arithmetic has no signed zero, so the hazard the +0.0
        // guards against cannot arise (q50's recursive compounding).
        val ok = """\s*\+\s*0\.0""".r.findPrefixOf(rest).isDefined ||
          """(?i)\s*AS\s+DECIMAL""".r.findPrefixOf(rest).isDefined
        assert(ok,
          s"${q.name}: ROUND( at offset ${m.start} not followed by + 0.0 (or a DECIMAL cast) — wrap as (ROUND(...) + 0.0)")
      }
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
