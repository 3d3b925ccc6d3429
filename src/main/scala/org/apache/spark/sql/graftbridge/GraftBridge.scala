package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); this
  * object lives under `org.apache.spark.sql` to re-export them to the
  * graft expression package — the standard piggyback for libraries that
  * ship native Catalyst expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a hand-built logical plan (for custom nodes like
    * `graft.plans.AsofJoinPlan`); `Dataset.ofRows` is `private[sql]` in
    * Spark 4.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `df.localCheckpoint(eager = true)` that also hands back the backing
    * RDD so iterative algorithms can `unpersist` superseded rounds —
    * `Dataset.localCheckpoint` alone gives the caller no handle to free
    * the block-manager copy, so loops leak one cached round per
    * iteration. Same mechanics as `Dataset.checkpoint(reliable=false)`:
    * copy rows (they are reused mutable buffers), cut lineage, cache,
    * materialize eagerly.
    *
    * The checkpointed DataFrame is built with `LogicalRDD.fromDataset`
    * — the same call `Dataset.checkpoint` uses — so the executed plan's
    * output PARTITIONING and ORDERING survive the lineage cut. An
    * iterative operator that keeps its state hash-partitioned on a
    * stable key (e.g. [[graft.functions.Suffix]] on the document id)
    * therefore pays zero exchanges for per-round window/aggregate
    * passes over that key; the old `internalCreateDataFrame` form
    * erased the metadata and forced a re-shuffle every round.
    *
    * The returned DataFrame is NOT recomputable once its RDD is
    * unpersisted (lineage was cut) — only unpersist a round after its
    * successor has been materialized and nothing else references it.
    */
  def localCheckpointHandle(
      df: DataFrame): (DataFrame, RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    val cd    = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = cd.sparkSession
    val rdd   = cd.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    val plan = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(rdd, cd, isStreaming = false)
    (org.apache.spark.sql.classic.Dataset.ofRows(spark, plan), rdd)
  }
}
