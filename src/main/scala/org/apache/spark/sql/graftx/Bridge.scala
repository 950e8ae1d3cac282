package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 made the direct
  * `new Column(expr)` constructor private[sql]; like other open-source
  * Spark extensions, we host this one-liner inside an
  * org.apache.spark.sql subpackage to reach the classic converter. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `AbstractDataType` is private[sql] in Spark 4; expressions outside
  * the sql package need this alias to override
  * `ExpectsInputTypes.inputTypes`. */
object Types {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
