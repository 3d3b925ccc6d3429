package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the catalog): does a window over the
  * checkpointed-and-explicitly-repartitioned key pay an exchange?
  * Prints the executed plan of `window(localCheckpoint(repartition(N,
  * key)))` — an `Exchange hashpartitioning(k...)` line means the
  * checkpoint lost the partitioning.
  */
object CpPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-cp-part-probe")
    import org.apache.spark.sql.graftbridge.GraftBridge.localCheckpointHandle
    val df = spark.range(100000)
      .select((col("id") % 1000).as("k"), col("id").as("v"))
      .repartition(32, col("k"))
    val (cp, _) = localCheckpointHandle(df, Seq("k"))
    println("== checkpointed plan outputPartitioning probe ==")
    val w = cp.withColumn("rn",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("v"))))
    w.write.format("noop").mode("overwrite").save()
    val cd = w.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    println(cd.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
