// This file is compiled into a subpackage of org.apache.spark.sql ON
// PURPOSE: Spark 4 makes the Column <-> Catalyst Expression converters
// (`classic.ExpressionUtils`) private[sql], and a native Expression such
// as graft's VecDotExpr needs them to surface as an ordinary Column
// without going through the session FunctionRegistry. A one-object
// bridge in the sql package namespace is the established extension
// escape hatch (the alternative — registering + expr("...") string
// round-trips — couples library call sites to session registry state).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
