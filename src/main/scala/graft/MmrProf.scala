package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for [[graft.functions.Similarity.mmrRerank]]'s
  * k−1 plan-unrolled greedy rounds (not part of the catalog): the
  * catalog query runs k=5; this measures where the driver-sequenced
  * unroll's round latency takes the wall as k grows (each round is an
  * anti-join + max-sim aggregate + per-query argmax window + one
  * local checkpoint with the predecessor freed — cost is rounds ×
  * round-latency over a bounded |queries|·n candidate table, NOT a
  * function of corpus size).
  *
  * Args: k values (e.g. `8 16 32 64`); n = 2k candidates per query,
  * 8 query vectors over the full embeddings table at
  * SPARK_GRAFT_SF_DIR. Two reps per k, min reported.
  */
object MmrProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-mmr-prof")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.filter(col("vec_id") < 8).count() // session warm-up
    def once(k: Int, pickBatch: Int): Double = {
      val t0 = System.nanoTime()
      graft.functions.Similarity.mmrRerank(
        e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
        n = 2 * k, k = k, lambdaBp = 7000, pickBatch = pickBatch).count()
      val s = (System.nanoTime() - t0) / 1e9
      // the returned frame is itself a checkpoint — free it between reps
      // exactly as Bench does, so later reps don't run under stranded
      // block-manager pressure
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      s
    }
    val ks = if (args.isEmpty) Array(8, 16, 32, 64) else args.map(_.toInt)
    ks.foreach { k =>
      // greedy (pickBatch = 1) vs batched at rounds held to 8 (b = k/8):
      // the knee claim is per-PICK wall flat under the batched variant
      val (a, b) = (once(k, 1), once(k, 1))
      val bb = math.max(1, k / 8)
      val (c, d) = (once(k, bb), once(k, bb))
      println(f"MMR k=$k n=${2 * k} greedy wall=${math.min(a, b)}%.2f s " +
        f"(reps $a%.2f / $b%.2f) per-pick=${math.min(a, b) / k}%.3f | " +
        f"batched b=$bb wall=${math.min(c, d)}%.2f s per-pick=${math.min(c, d) / k}%.3f")
    }
    spark.stop()
  }
}
