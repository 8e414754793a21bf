package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the constructors `private[sql]`;
  * placing this object under `org.apache.spark.sql` is the standard way for
  * libraries to register custom Catalyst expressions without a fork.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built logical plan (custom operators). The
    * `Dataset.ofRows` constructor is `private[sql]` in Spark 4 — same
    * bridge rationale as the Column constructors above. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame — the child plans a
    * custom logical operator composes over. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Cap the size estimate a `localCheckpoint()` INHERITS from its child
    * plan (Spark 4's `LogicalRDD.fromDataset` rewrites the planned
    * Statistics onto the checkpoint). Join estimates are PRODUCTS of child
    * sizes, so an iterative loop that self-joins its previous round's
    * checkpoint squares the inherited BigInt estimate every round — the
    * estimate's BIT LENGTH grows as 2^rounds, and by round ~10 the driver
    * burns whole seconds (observed: minutes) in Toom-Cook BigInteger
    * multiplies inside stats estimation, single-threaded, per planned job.
    * Capping at Long.MaxValue keeps every downstream product word-cheap
    * while preserving the only thing a size-only estimate this large can
    * mean ("huge — never auto-broadcast"): real sizes, even at 100 TB, sit
    * orders of magnitude below the cap, so only poisoned estimates are
    * touched, and AQE's runtime re-optimization (actual sizes) is what
    * picks broadcast upgrades regardless. */
  def capCheckpointStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    val cap = BigInt(Long.MaxValue)
    analyzed(df) match {
      // a LogicalRDD is a leaf: .stats is just the inherited originStats
      // (or the default), no tree walk — the check itself is cheap
      case lr: LogicalRDD if lr.stats.sizeInBytes > cap =>
        ofRows(df.sparkSession,
          new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            Some(Statistics(sizeInBytes = cap)), None))
      case _ => df
    }
  }
}
