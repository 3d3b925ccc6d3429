package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: match point rows to every interval row
  * with start ≤ point ≤ end (inclusive, BETWEEN semantics).
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop — |P|·|I|
  * comparisons. This composes the standard scalable shape instead:
  * coarse time buckets of `bucketSeconds` become an equi-join key; each
  * point belongs to exactly ONE bucket while each interval explodes to
  * the buckets it overlaps, so the hash join only compares
  * point/interval pairs whose buckets coincide, and no dedup is needed
  * (a matching pair meets in precisely the point's bucket).
  *
  * Cost: shuffle keyed on bucket; interval expansion factor is
  * ceil(span/bucketSeconds)+1 rows per interval. Pick `bucketSeconds`
  * near the typical interval span so expansion stays O(1) while bucket
  * population stays small. Long-tailed interval spans → split the few
  * giants first (they would explode into many buckets).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      pointTs: String,
      intervals: DataFrame,
      startTs: String,
      endTs: String,
      bucketSeconds: Long): DataFrame = {
    val pb = points.withColumn(
      "_bucket", floor(col(pointTs).cast("long") / bucketSeconds))
    val ib = intervals
      .withColumn("_bucket", explode(sequence(
        floor(col(startTs).cast("long") / bucketSeconds),
        floor(col(endTs).cast("long") / bucketSeconds))))
    pb.join(ib, Seq("_bucket"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("_bucket")
  }
}
