package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level profile of q_dsir_select's plan (perf diagnosis):
  * `runMain graft.DsirProf <sfDir> [reps]` re-runs the dsirSelect body
  * with a timer around each materialization so the wall time decomposes
  * into {scored checkpoint, cum histogram, keptFull, keptBoundary}.
  * Budget is [[Queries.DsirBudget]] — the same configuration the
  * catalog query runs.
  *
  * Every checkpoint is taken through `localCheckpointHandle` and freed
  * at the end of its rep (plain `localCheckpoint` gives no handle to
  * the block-manager copy), so later reps measure a clean block
  * manager, not accumulated snapshot pressure.
  */
object DsirProf {
  import org.apache.spark.sql.graftbridge.GraftBridge.localCheckpointHandle

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val budget = Queries.DsirBudget
    val spark = GraftSession.local("graft-dsirprof")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    SparkEntry.queries("q1_pricing")(spark, sfDir).count() // warm-up
    if (sys.env.contains("DSIR_PROF_PLANS")) {
      println("=== COUNT PLAN ===")
      Queries.dsirScored(spark, sfDir).groupBy().count().explain("formatted")
      println("=== FULL PLAN ===")
      Queries.dsirScored(spark, sfDir).explain("formatted")
    }
    (0 until reps).foreach { i =>
      println(s"--- rep $i load=${java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage}")
      tm("scored_plain_count")(Queries.dsirScored(spark, sfDir).count())
      val (tas, tasRdd) = tm("scored_tas_ckpt") {
        val feats = graft.functions.Dsir.features(
          Tables(spark, sfDir).documents
            .withColumn("tgt", col("source") === "src0"),
          "doc_id", "text", carry = Seq("tgt"), buckets = 1024)
        localCheckpointHandle(graft.functions.Dsir.trainAndScore(feats, "doc_id"))
      }
      tasRdd.unpersist(blocking = true)
      val (scored, scoredRdd) = tm("scored_ckpt")(
        localCheckpointHandle(Queries.dsirScored(spark, sfDir)))
      val hist = scored.groupBy(col("dsir_bits")).agg(
        count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
      val wOrd = Window.partitionBy(lit(1)).orderBy(col("dsir_bits").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val (cum, cumRdd) = tm("cum_ckpt")(localCheckpointHandle(
        hist.withColumn("cum_before",
          coalesce(sum(col("toks")).over(wOrd), lit(0L)))))
      val full = cum.filter(col("cum_before") + col("toks") <= budget)
        .select(col("dsir_bits"))
      val boundary = cum
        .filter(col("cum_before") < budget &&
          col("cum_before") + col("toks") > budget)
        .select(col("dsir_bits"), col("cum_before"))
      val keptFull = scored.join(broadcast(full), Seq("dsir_bits"))
        .select(col("doc_id"), col("dsir_bits"), col("n_toks"),
          lit(false).as("at_boundary"))
      val nf = tm("keptFull_count")(keptFull.count())
      val wBoundary = Window.partitionBy(col("dsir_bits")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val keptBoundary = scored.join(broadcast(boundary), Seq("dsir_bits"))
        .withColumn("rcum", sum(col("n_toks")).over(wBoundary))
        .filter(col("cum_before") + col("rcum") <= budget)
        .select(col("doc_id"), col("dsir_bits"), col("n_toks"),
          lit(true).as("at_boundary"))
      val nb = tm("keptBoundary_count")(keptBoundary.count())
      val nu = tm("union_count")(keptFull.unionByName(keptBoundary).count())
      println(s"rows full=$nf boundary=$nb union=$nu")
      scoredRdd.unpersist(blocking = true)
      cumRdd.unpersist(blocking = true)
    }
    spark.stop()
  }
}
