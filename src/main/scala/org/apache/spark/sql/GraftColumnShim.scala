package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4's `Column` wraps a `ColumnNode` rather than an
  * `Expression`; the conversion helpers live in
  * `org.apache.spark.sql.classic.ExpressionUtils` and are `private[sql]`,
  * so this one-file shim re-exports exactly the two conversions the
  * library needs. No Spark internals are modified.
  */
object GraftColumnShim {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to the Catalyst expression it resolves to. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fork the session state (own CatalogManager/conf/temp views, shared
    * SparkContext and cache) — `cloneSession` is `private[sql]` in Spark
    * 4. Used to analyze view SQL under the view's catalog context without
    * mutating the caller's session. */
  def cloneSession(s: SparkSession): SparkSession = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.cloneSession()
    case other => other.newSession()
  }

  /** AQE rebalance by arbitrary EXPRESSIONS (partition transforms, not
    * just column refs — the REBALANCE hint validates its parameters down
    * to bare attributes, so `df.hint("rebalance", transformCol)` is
    * rejected). Builds the `RebalancePartitions` node directly: small
    * output partitions coalesce and skewed ones split, which is exactly
    * the pre-write distribution a partitioned table wants. */
  def rebalance(df: DataFrame, exprs: Seq[Expression]): DataFrame = df match {
    case c: org.apache.spark.sql.classic.DataFrame =>
      classic.Dataset.ofRows(c.sparkSession,
        org.apache.spark.sql.catalyst.plans.logical.RebalancePartitions(
          exprs, c.logicalPlan))
    case other => // non-classic session: strict hash repartition
      other.repartition(exprs.map(ExpressionUtils.column): _*)
  }
}
