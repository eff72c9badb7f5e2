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

  /** Rebuild a checkpointed Dataset's [[LogicalRDD]] with
    * materialization-derived statistics. `Dataset.checkpoint` copies the
    * PRE-checkpoint plan's estimate into `originStats` — for graft's
    * shared postings/pair frames that estimate runs orders of magnitude
    * low (explode/window/distinct chains), and the planner then
    * BROADCASTS a data-sized frame into every consumer join (observed:
    * a 40M-row 8-gram postings frame as an UnsafeHashedRelation —
    * executor OOM at sf1, an outage at 100 TB). The checkpoint FILES
    * are the materialized truth; callers pass their byte count
    * (×compression) as the honest sizeInBytes. */
  def withStats(df: org.apache.spark.sql.DataFrame,
                sizeInBytes: BigInt): org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = sizeInBytes)
        org.apache.spark.sql.classic.Dataset.ofRows(spark,
          new org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming, lr.stream)(spark, Some(stats), None))
      case _ => df
    }
}
