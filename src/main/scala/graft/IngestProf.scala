package graft

import org.apache.spark.sql.functions._

/** Scratch profiler (not part of the catalog): per-trigger cost of the
  * streaming phrase-audit ingest vs ACCUMULATED store size, and offline
  * probe cost vs store size. Executes exactly the per-batch work of
  * [[graft.streaming.Pipelines.phraseAuditIngest]]'s foreachBatch body
  * (per-batch report + atomic posting publication) against doc-id
  * slices, so the trigger cost is measured without MemoryStream
  * scaffolding; probes run [[graft.functions.Curation.phraseMatchesStore]]
  * over the growing store. Expectation under the O(batch)-per-trigger
  * contract: trigger cost flat in batch index; probe cost growing only
  * with the store's file count inside the probed term buckets.
  *
  * Args: [nBatches] (default 50).
  */
object IngestProf {
  def main(args: Array[String]): Unit = {
    val sfDir    = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = if (args.nonEmpty) args(0).toLong else 50L
    val spark    = GraftSession.local("graft-ingest-prof")
    import graft.functions.{Curation, Stores}
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val n   = all.count()
    val per = math.max(n / nBatches, 1L)
    val phrases  = Seq("table table", "spark", "scan slow fast")
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_ingest_prof").toString

    def trigger(b: Long): Double = {
      val batch = all.filter(
        col("doc_id") >= b * per && col("doc_id") < (b + 1) * per)
      val t0 = System.nanoTime()
      Stores.publishOnce(spark, s"$stateDir/report/batch=$b")(
        Curation.phraseMatches(batch, "doc_id", "text", phrases)
          .write.mode("overwrite").parquet(_))
      Stores.publishOnce(spark, s"$stateDir/postings/batch=$b")(
        Curation.writePostingsRaw(
          Curation.phrasePostings(batch, "doc_id", "text"), _,
          Curation.PhrasePostingBuckets))
      (System.nanoTime() - t0) / 1e9
    }

    def probe(): Double = {
      val t0 = System.nanoTime()
      Curation.phraseMatchesStore(spark, s"$stateDir/postings", phrases).count()
      (System.nanoTime() - t0) / 1e9
    }

    all.filter(col("doc_id") < 100).count() // session warm-up
    (0L until nBatches).foreach { b =>
      val s = trigger(b)
      if (b % 10 == 0 || b == nBatches - 1)
        println(f"INGEST batch=$b trigger=$s%.2f probe@${b + 1}=${probe()}%.2f")
      else println(f"INGEST batch=$b trigger=$s%.2f")
    }
    spark.stop()
  }
}
