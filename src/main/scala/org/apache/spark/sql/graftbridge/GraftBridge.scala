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
      df: DataFrame): (DataFrame, RDD[org.apache.spark.sql.catalyst.InternalRow]) =
    localCheckpointHandle(df, Nil)

  /** [[localCheckpointHandle]] with a DECLARED hash partitioning.
    *
    * `fromDataset` is documented to carry the executed plan's output
    * partitioning across the lineage cut, but under AQE (Spark 4.1) the
    * rewrite comes back `UnknownPartitioning` — measured: a window over
    * `localCheckpoint(repartition(32, k))` re-exchanged its input
    * (round-15 CpPartProbe), which silently re-shuffled every
    * iterative operator's state once per round. When `hashKeys` is
    * non-empty the checkpointed plan is rebuilt with an explicit
    * `HashPartitioning(hashKeys, rdd.getNumPartitions)` and its
    * statistics are the MEASURED block-manager size of the cached copy.
    *
    * CONTRACT: the caller must guarantee the input plan ends in an
    * EXPLICIT-COUNT `repartition(n, hashKeys...)` — AQE never coalesces
    * explicit-count repartitions, so the physical layout really is
    * `hash(keys) % n`. Declaring keys over an ENSURE_REQUIREMENTS (or
    * bare `repartition(col)`) exchange is UNSOUND: AQE's coalescing
    * merges adjacent hash buckets and the layout is no longer a
    * HashPartitioning — downstream joins/aggregates would silently skip
    * a required shuffle and produce wrong results.
    */
  def localCheckpointHandle(
      df: DataFrame,
      hashKeys: Seq[String]): (DataFrame, RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    val cd    = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = cd.sparkSession
    val rdd   = cd.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    // debug: checkpoint actions run through toRdd, outside SQL-execution
    // tracking, so the UI's SQL tab never shows their (adaptive) plans —
    // this env-gated dump is the only window into what each
    // materialization actually executed
    if (sys.env.contains("GRAFT_CP_EXPLAIN"))
      println("==== CP PLAN @" + Thread.currentThread.getStackTrace
        .drop(2).find(_.getClassName.startsWith("graft"))
        .map(e => e.getFileName + ":" + e.getLineNumber).getOrElse("?") +
        "\n" + cd.queryExecution.executedPlan.toString)
    val plan0 = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(rdd, cd, isStreaming = false)
    val plan =
      if (hashKeys.isEmpty) plan0
      else {
        val lr = plan0.asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
        val attrs = hashKeys.map(k =>
          lr.output.find(_.name == k).getOrElse(sys.error(
            s"localCheckpointHandle: declared hash key '$k' not in output " +
              lr.output.map(_.name).mkString("[", ", ", "]"))))
        val part = org.apache.spark.sql.catalyst.plans.physical
          .HashPartitioning(attrs, rdd.getNumPartitions)
        // measured size of the cached copy — better than the origin
        // plan's estimate, and it keeps broadcast decisions sane
        val bytes = spark.sparkContext.getRDDStorageInfo
          .find(_.id == rdd.id)
          .map(i => i.memSize + i.diskSize)
          .filter(_ > 0L)
        val stats = bytes.map(b =>
          org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = BigInt(b)))
        lr.copy(outputPartitioning = part)(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          stats, None)
      }
    (org.apache.spark.sql.classic.Dataset.ofRows(spark, plan), rdd)
  }
}
