package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> Expression converters that
  * Spark 4 hides behind the Column-node API. The standard pattern for
  * libraries that ship custom Catalyst expressions with a typed Column
  * facade (the converters themselves are stable public static methods in
  * bytecode; only the Scala access modifier is narrowed).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply an extensions object's injected functions to an EXISTING
    * session (getOrCreate ignores `withExtensions` when a session is
    * already alive; libraries register into the live registry instead). */
  def registerInto(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
