package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported bridge (`classic.ExpressionUtils`) is package-private to
  * org.apache.spark.sql, so this shim re-exports the two conversions the
  * engine needs for its custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a Column assembled from `sql.functions` builders into an
    * ANALYZER-RESOLVABLE expression tree. `expression` wraps the column's
    * node as an opaque `ColumnNodeExpression` (fine when the tree is
    * already catalyst expressions; Unevaluable when it still holds
    * UnresolvedFunction column nodes) — this walks the ColumnNode tree
    * through Spark's own converter instead, producing the
    * `UnresolvedFunction` catalyst nodes the analyzer knows how to
    * resolve. Needed when registering composite builtin trees as SQL
    * functions (GraftExtensions.text_quality_score). */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
