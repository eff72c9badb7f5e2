package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 moved `Column(expr)` / `col.expr` behind
  * `private[sql] classic.ExpressionUtils`; this one-file subpackage of
  * `org.apache.spark.sql` is the supported-by-scoping way for an external
  * library to lift a custom codegen `Expression` into the public Column
  * API without registering session extensions (which a foreign-built
  * SparkSession — e.g. the harness's own — would not have).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Lift a hand-built (already-resolved) LogicalPlan into a DataFrame —
    * the entry point for graft's custom logical operators
    * (`graft.plans`); `Dataset.ofRows` is `private[sql]`. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
