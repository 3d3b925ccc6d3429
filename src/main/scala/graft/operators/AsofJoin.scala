package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single right row with the greatest
  * right timestamp ≤ the left timestamp, per key (inclusive ties; classic
  * "price as of trade time" / "last click before purchase").
  *
  * Spark has no native as-of join; rather than a custom `SparkStrategy`,
  * this composes existing operators into the plan a native implementation
  * would want anyway:
  *
  *   union(left tagged 1, right tagged 0)
  *     → window last(value, ignoreNulls) over
  *         (partitionBy key, orderBy ts, tag; rows unbounded→current)
  *     → filter tag = 1
  *
  * Cost: ONE shuffle of |L|+|R| rows keyed on `key` plus a per-partition
  * sort — the same merge-scan shape DuckDB's native ASOF JOIN executes —
  * instead of the per-left-row probe of a naive correlated subquery or
  * the |L|×|R| blowup of an inequality theta-join (which Spark plans as
  * BroadcastNestedLoop). Skewed keys: pre-split with [[Skew]]-style
  * salting on a coarse time bucket if one key dominates.
  *
  * At equal timestamps the right row sorts first (tag 0 < 1), so a right
  * row exactly at the left timestamp matches — DuckDB `ASOF JOIN ...
  * ON l.ts >= r.ts` semantics. If the right side can hold several rows
  * per (key, ts), pre-aggregate it: "last" among them is otherwise
  * order-dependent.
  */
object AsofJoin {

  /** @param valueCols right-side columns carried to matched left rows
    *                  (null when no right row precedes the left row)
    * @param matchedTs output column holding the matched right timestamp
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      matchedTs: String = "asof_ts"): DataFrame = {
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right
      .select((col(key) +: col(rightTs).as("_ts") +: valueCols.map(col)): _*)
      .withColumn("_side", lit(0))
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, v) => df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }.withColumn(
      matchedTs,
      last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
    carried
      .filter(col("_side") === 1)
      .drop("_ts", "_side")
  }
}
