package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._

/** Input-parallelism floor for compute-bound map stages (optimization
  * guide §2.5, "input skew"): a narrow scan — one small parquet split,
  * one unsplittable file — serializes every expensive per-row expression
  * planned above it, because the map inherits the SCAN's parallelism,
  * not the cluster's. Measured on q_dedup_minhash at sf0.1: the whole
  * md5-per-token signature build ran as ONE 0.9 s task above the single
  * 0.6 MB documents split while 31 cores idled.
  *
  * [[floor]] hash-repartitions the input to
  * `spark.sql.shuffle.partitions` ONLY when the plan is narrower than
  * that target, so:
  *   - local/bench (single-split scans): the signature maps spread
  *     across every core for the price of one raw-text exchange
  *     (~1 byte/char, vs the k·md5-per-token map it unlocks);
  *   - production (scans already at least conf-target wide): identity —
  *     no new exchange, the plan is unchanged.
  *
  * The width probe walks `queryExecution.toRdd`, which is only safe on
  * exchange-free lineage (under AQE, `toRdd` on a plan with shuffles
  * MATERIALIZES the upstream stages eagerly — and the caller's later
  * action would then recompute them). [[floor]] therefore first proves
  * the lineage narrow (leaf / project / filter / generate only) and
  * returns the input untouched otherwise: a frame below a join or
  * aggregate is already shuffle-partitioned to the conf target, so the
  * floor has nothing to fix there anyway.
  *
  * Keyed (hash) repartition rather than round-robin: deterministic
  * row routing under task retries (the SPARK-38388 class of bugs) and
  * no sort-before-repartition pass.
  */
private[graft] object Spread {

  /** True iff every node from `p` down is a narrow, exchange-free
    * operator — the lineage shape where `toRdd` is a pure metadata
    * probe and scan parallelism is the frame's real parallelism.
    */
  private def narrowOnly(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case _: Project | _: Filter | _: Generate | _: SubqueryAlias =>
      p.children.forall(narrowOnly)
    case _ => false
  }

  /** `df` hash-partitioned on `key` to the conf shuffle-partition count
    * when its (provably narrow) plan is below that width; `df` itself
    * in every other case.
    */
  def floor(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (narrowOnly(df.queryExecution.analyzed) &&
        df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target, key)
    else df
  }
}
