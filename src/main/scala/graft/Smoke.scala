package graft

/** Local replica of the driver's t1 smoke check (SparkEntry.entry on
  * sf0.001, rows > 0) plus a streaming smoke: the charts pipeline end to
  * end over a MemoryStream with a complete-mode sink.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    // reap nonce scratch stranded by crashed/killed prior runs
    graft.functions.Stores.sweepStaleScratch()
    val spark = GraftSession.local("graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"SMOKE entry rows=$n ${if (n > 0) "OK" else "FAIL"}")

    // streaming spine: MemoryStream → parse → explode → agg → memory sink
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.{Encoders, functions => F}
    val in = MemoryStream[String](Encoders.STRING, spark)
    val (_, hot) = streaming.Pipelines.chartBranches(in.toDF().select(F.col("value")))
    val q = streaming.Sinks.completeToMemory(hot, "smoke_hot").start()
    in.addData(
      """{"name":"A","appid":1,"type":"game","genres":["Action","Indie"],"timestamp_scraped":"2024-01-01T00:00:00"}""",
      """{"name":"B","appid":2,"type":"game","genres":["Action"],"timestamp_scraped":"2024-01-01T00:00:00"}""")
    q.processAllAvailable()
    val hotRows = spark.table("smoke_hot").collect()
    hotRows.foreach(println)
    q.stop()
    val streamOk = hotRows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("Action" -> 2L, "Indie" -> 1L)
    println(s"SMOKE streaming ${if (streamOk) "OK" else "FAIL"}")

    spark.stop()
    if (n <= 0 || !streamOk) sys.exit(1)
  }
}
