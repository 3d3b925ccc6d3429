package graft

/** Scratch profiler (not part of the catalog): run ONE catalog query
  * with the Spark UI/REST API enabled, twice (cold+warm), then park so
  * per-stage metrics can be pulled from http://localhost:4040/api/v1.
  *
  *   sbt "runMain graft.QueryProbe <queryName> [parkSeconds]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val park = args.lift(1).map(_.toInt).getOrElse(240)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-query-probe")
      .config("spark.ui.enabled", "true")
      .master(s"local[${GraftSession.cpus}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    for (r <- 1 to 2) {
      spark.sparkContext.setJobDescription(s"$name run $r")
      val t0 = System.nanoTime()
      q.spark(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"RUN$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    println("PARKED — UI at http://localhost:4040")
    Thread.sleep(park * 1000L)
    spark.stop()
  }
}
