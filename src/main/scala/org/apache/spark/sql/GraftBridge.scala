package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column internals. Spark 4 removed the public
  * `Column(Expression)` constructor (columns now wrap `ColumnNode`s for
  * Connect compatibility); this object lives in the `org.apache.spark.sql`
  * package purely to regain that access for graft's custom Catalyst
  * expressions. It contains no copied Spark code.
  */
object GraftBridge {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic-session) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw LogicalPlan (Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a temp SQL function on a live session (functionRegistry is
    * private[sql]; the extensions hook only works at session build time).
    */
  def registerTempFunction(spark: SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Unpersist the cached blocks behind an eagerly localCheckpoint'ed
    * DataFrame. `Dataset.unpersist` only clears cache-manager entries;
    * a checkpoint's blocks belong to the `LogicalRDD`-wrapped RDD the
    * checkpointed frame reads from, which iterative loops must release
    * explicitly or pin O(rounds × |data|) storage until session end.
    * No-op on frames that are not checkpoint-backed.
    */
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
