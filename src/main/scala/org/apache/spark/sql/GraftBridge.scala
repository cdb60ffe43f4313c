package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for graft's native expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so this one-file shim
  * lives in the `org.apache.spark.sql` package to re-export the two
  * conversions — the standard pattern for libraries that ship custom
  * Catalyst expressions without forking Spark. No Spark internals are
  * modified; this only forwards two public-at-bytecode methods.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * `private[sql]`); the runtime session is always the classic one. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The session's name-resolution rule (honors spark.sql.caseSensitive,
    * which defaults to case-insensitive like the rest of the API). */
  def resolver(spark: SparkSession): (String, String) => Boolean =
    spark.sessionState.conf.resolver

  /** Register a native expression as a SQL temp function on an EXISTING
    * session (the SparkSessionExtensions path only applies at session
    * build, which a host application may not control). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
