package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark 4's sql-private Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), used to expose graft's
  * custom Catalyst expressions as `Column`s. Standard extension-library
  * technique; nothing else from the private API is touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER ColumnNode→catalyst conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper whose tree is the sql-api ColumnNode
    * graph, useless for structural inspection; this converter produces the
    * real catalyst nodes (`GreaterThanOrEqual`, `In`, …) that metadata-level
    * predicate evaluation (snapshot file pruning) pattern-matches on. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** `AbstractDataType` is private[sql] in Spark 4, but `ExpectsInputTypes.
    * inputTypes` (the analysis-time input contract custom aggregates must
    * override to get implicit casts instead of executor-side
    * ClassCastExceptions) returns Seq of it — this public alias lets
    * graft's expressions name the type from outside the package. */
  type SqlAbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
