package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned) tables: the co-located large⨝large join
  * path. Both sides written with the same bucket count on the join key
  * join with ZERO shuffle exchanges — at 100 TB this is the difference
  * between re-shuffling both fact tables per query and a local merge per
  * bucket.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two same-bucketed tables plans without shuffle exchanges") {
    val dir = tmpDir("buckets")
    val a = spark.range(10000).select(col("id").as("k"), (col("id") % 97).as("va"))
    val b = spark.range(10000).select(col("id").as("k"), (col("id") % 89).as("vb"))
    a.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/a").saveAsTable("bkt_a")
    b.write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/b").saveAsTable("bkt_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        .agg(sum(col("va") * col("vb")))
      joined.collect().head.getLong(0) shouldBe
        (0L until 10000L).map(i => (i % 97) * (i % 89)).sum
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      // join itself is co-located: the only shuffle is the final 1-row agg
      val joinPlan = joined.queryExecution.executedPlan.toString
      joinPlan should include("SortMergeJoin")
      shuffles.count(_.toString.contains("hashpartitioning(k")) shouldBe 0
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
