package graft

import org.apache.spark.sql.functions._

/** Scratch profiler (not part of the catalog): runs q_dup_spans' operator
  * with the Spark UI/REST API enabled and then parks, so per-stage task
  * metrics can be pulled from http://localhost:4040/api/v1 while the
  * session is alive. Usage:
  *
  *   sbt "runMain graft.DupSpanProbe [maxDoc] [cap] [parkSeconds]"
  */
object DupSpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxDoc = args.lift(0).map(_.toLong).getOrElse(5000L)
    val cap = args.lift(1).map(_.toLong).getOrElse(32L)
    val park = args.lift(2).map(_.toInt).getOrElse(180)
    val spark = GraftSession.builder("graft-dupspan-probe")
      .config("spark.ui.enabled", "true")
      .master(s"local[${GraftSession.cpus}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < maxDoc)
    docs.limit(10).count() // warm-up
    for (r <- 1 to 2) {
      spark.sparkContext.setJobDescription(s"dupSpans run $r")
      val t0 = System.nanoTime()
      graft.functions.Suffix.dupSpans(docs, "doc_id", "text", 20L, cap)
        .write.format("noop").mode("overwrite").save()
      println(f"RUN$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    println("PARKED — UI at http://localhost:4040")
    Thread.sleep(park * 1000L)
    spark.stop()
  }
}
