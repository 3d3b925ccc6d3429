package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the suffix family (not part of the catalog). */
object SuffixProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-suffix-prof")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 500)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up session
    docs.count()
    time("ranks-1") {
      graft.functions.Suffix.suffixRanks(docs, "doc_id", "text").count()
    }
    time("ranks-2") {
      graft.functions.Suffix.suffixRanks(docs, "doc_id", "text").count()
    }
    time("lcp-1") {
      graft.functions.Suffix.adjacentLcp(docs, "doc_id", "text").count()
    }
    time("lcp-2") {
      graft.functions.Suffix.adjacentLcp(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
