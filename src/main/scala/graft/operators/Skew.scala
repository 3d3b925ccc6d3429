package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (SURVEY.md §7.2 step 9: "salted
  * keys for hot appids").
  *
  * A single viral app (or null-ish key) can put most of a 100 TB stream
  * into one reduce partition. AQE's skew-join splitting does not help
  * aggregations, so the classic fix is a two-phase salted aggregation:
  *
  *   phase 1: groupBy(keys :+ salt) with partial (algebraic) aggregates —
  *            the hot key's rows spread across `saltBuckets` reducers;
  *   phase 2: groupBy(keys) merging the ≤ saltBuckets partial rows/key.
  *
  * Phase 2's input is tiny (|distinct keys| × saltBuckets), so the second
  * shuffle is negligible; total cost ≈ one well-balanced shuffle.
  *
  * Only algebraic aggregates decompose this way (count→sum, sum→sum,
  * min/max→min/max, avg→sum/count); the caller provides the partial
  * columns and the merge columns explicitly. Keep monetary/summed values
  * in integers so the two-phase result is bit-identical to the direct
  * aggregation (integer addition is associative — double addition is not).
  */
object Skew {

  /** Deterministic-result salted aggregation. The salt value itself is
    * arbitrary (any row→bucket spread gives the same final result); it
    * must only be cheap and well-distributed, not reproducible.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int)(
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn(
      "_salt", pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
