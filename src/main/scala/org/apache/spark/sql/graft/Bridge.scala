package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column↔Expression API.
  * Spark 4 removed the public `new Column(expr)` constructor; extension
  * libraries reach the classic converter from inside the sql package
  * namespace (same pattern as spark-xml / sedona / delta).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The user-visible name a Column would take as a struct field /
    * projection output (alias name, or the attribute's last name part),
    * read off the `private[sql]` ColumnNode — pre-analysis, Columns are
    * lazy ColumnNodeExpression wrappers and the catalyst NamedExpression
    * shape is not yet visible. */
  def columnName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.Alias => Some(a.name.last)
    case u: org.apache.spark.sql.internal.UnresolvedAttribute => Some(u.nameParts.last)
    case _ => None
  }

  /** DataFrame over a custom logical plan (`Dataset.ofRows` is
    * `private[sql]`) — the standard extension-library entry point for
    * library-defined LogicalPlan nodes. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
