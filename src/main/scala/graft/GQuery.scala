package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named engine query: a Spark plan plus (optionally) the equivalent
  * DuckDB SQL oracle the driver uses for the correctness gate.
  *
  * Oracle-parity rules (see SURVEY.md §6): identical output column names,
  * total ORDER BY on both sides, exact DECIMAL aggregation of money-like
  * doubles with a final cast back to DOUBLE (bit-identical across engines),
  * single double division for averages, BIGINT casts where DuckDB would
  * return HUGEINT.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GQuery {
  /** Exact money arithmetic: cast a 2-dp double to decimal. */
  def d2(c: Column): Column = c.cast(DecimalType(14, 2))
  /** Exact rate arithmetic (discount/tax, 2-dp in [0,1]). */
  def r2(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Exact decimal sum surfaced as a deterministic double. */
  def sumd(c: Column): Column = sum(c).cast(DoubleType)

  /** Signed-zero-safe round: Spark's round() goes through BigDecimal
    * (no signed zero → +0.0) while DuckDB's ROUND preserves IEEE -0.0, so
    * a score that rounds to zero from below hashes differently across
    * engines even though `=` says equal (the round-4 t16 failure). Adding
    * +0.0 normalizes: IEEE -0.0 + 0.0 = +0.0, and x + 0.0 = x for every
    * other x (including NULL and NaN propagation). Every rounded DOUBLE
    * output column MUST use this, with `(ROUND(...) + 0.0)` mirrored in
    * the oracle SQL — OracleLintSpec enforces both sides.
    */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
  def roundz(c: Column): Column = round(c) + lit(0.0)
}
