package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4 made the converters (`classic.ExpressionUtils`) private[sql];
  * extension libraries conventionally expose them from a subpackage of
  * org.apache.spark.sql (cf. the public Dataset-factory pattern used by
  * Spark-extension projects).
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
