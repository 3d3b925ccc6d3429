package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's downstream query surface (SURVEY.md §2.D) — MongoDB
  * aggregation pipelines over the hot tables, re-expressed as batch
  * DataFrame operators. Citations: test/demo-queries.js,
  * provisioning/dashboards/mongodb_dashboard.json.
  *
  * Every operator keeps a deterministic total order (explicit tie-break
  * keys) so results are reproducible across engines and runs — required
  * for the oracle gate and good hygiene for paginated serving.
  */
object Serving {

  /** D1 — `$group` re-aggregation over a hot table
    * (demo-queries.js:98-110, 141-151).
    */
  def reAggregate(hot: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    hot.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** D2 — top-k with deterministic tie-break (demo-queries.js:37-38,
    * 65-68; dashboard "Top Games by Peak Players":962). Physical plan is
    * TakeOrderedAndProject — no global sort, each partition keeps k rows.
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** D4 — `$cond` label projection (demo-queries.js:32). */
  def sentimentLabel(recommended: Column): Column =
    when(recommended, lit("Positive")).otherwise(lit("Negative"))

  /** D5+D6 — `$match` + `$count` (dashboard.json:354). */
  def filterCount(df: DataFrame, cond: Column, as: String): DataFrame =
    df.filter(cond).agg(count(lit(1)).as(as))

  /** D7 — argmax row: `findOne` with sort (demo-queries.js:193-194). */
  def latest(df: DataFrame, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(1)

  /** D8 — cross-collection summary: the reference unions per-collection
    * counts client-side (demo-queries.js:179-245); here a real union.
    */
  def unionSummary(tables: Seq[(String, DataFrame)]): DataFrame =
    tables
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("value")).select(lit(name).as("metric"), col("value"))
      }
      .reduce(_.unionAll(_))

  /** D9 — retention job: TTL-equivalent delete (mongodb-indexes.js:16-23,
    * 30-day TTL). Expressed as a filter the caller rewrites the table with;
    * at scale this is a partition-drop on a date-partitioned table, not a
    * row scan.
    */
  def retain(df: DataFrame, tsCol: String, olderThan: Column): DataFrame =
    df.filter(col(tsCol) >= olderThan)
}
