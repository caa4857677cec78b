package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface: build a DataFrame from a
  * custom LogicalPlan (the documented pattern for libraries adding
  * operators — same door SparkSessionExtensions-injected plans use).
  */
object GraftSqlInternals {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The session's [[SparkSessionExtensions]] — shared with every
    * [[SparkSession.newSession]] descendant, so a rule injected here
    * at runtime is active in every session MATERIALIZED afterwards
    * (the already-built analyzer of the current session is fixed;
    * production installs ride `spark.sql.extensions` instead).
    */
  def extensionsOf(spark: SparkSession): SparkSessionExtensions =
    spark.asInstanceOf[classic.SparkSession].extensions

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Unload every loaded state-store provider (and leave the
    * maintenance thread idle until the next stateful query loads one).
    * Run-to-completion streaming harnesses call this after
    * awaitTermination: completed AvailableNow queries never reuse
    * their stores, and keeping hundreds of providers loaded makes the
    * background maintenance churn on deleted temp checkpoints.
    */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()

  /** Re-wrap a batch DataFrame's physical RDD as an isStreaming=true
    * plan — what a v1 streaming Source's getBatch must return (the
    * engine asserts isStreaming; the same LogicalRDD door the
    * built-in file/kafka v1 sources used).
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(spark, execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd, isStreaming = true)(spark))
  }
}
