package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the suffix family (not part of the catalog).
  *
  * Modes:
  *   - no args: warm phase profile of suffixRanks + adjacentLcp on the
  *     catalog's bounded slice (doc_id < 500 at SPARK_GRAFT_SF_DIR)
  *   - args = doc counts (e.g. `500 1000 2000 4000`): growth study —
  *     runs each operator twice per bound (min reported) so PERF.md can
  *     show the bounded slice is data-dominated, not overhead-dominated
  *     (time grows with SuffixMaxDoc).
  */
object SuffixProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-suffix-prof")
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF $label $s%.2f s"); s
    }
    all.filter(col("doc_id") < 100).count() // session warm-up
    if (args.isEmpty) {
      val docs = all.filter(col("doc_id") < 500)
      for (r <- 1 to 2) {
        time(s"ranks-$r")(
          graft.functions.Suffix.suffixRanks(docs, "doc_id", "text").count())
        time(s"lcp-$r")(
          graft.functions.Suffix.adjacentLcp(docs, "doc_id", "text").count())
      }
    } else {
      args.map(_.toLong).foreach { bound =>
        val docs = all.filter(col("doc_id") < bound)
        val chars = docs.agg(sum(length(col("text")))).head.getLong(0)
        def mintime(label: String)(f: => Any): Double = {
          val a = time(s"$label-a")(f); val b = time(s"$label-b")(f)
          math.min(a, b)
        }
        val ra = mintime(s"ranks@$bound")(
          graft.functions.Suffix.suffixRanks(docs, "doc_id", "text").count())
        val lc = mintime(s"lcp@$bound")(
          graft.functions.Suffix.adjacentLcp(docs, "doc_id", "text").count())
        println(f"GROWTH docs=$bound chars=$chars ranks=$ra%.2f lcp=$lc%.2f")
      }
    }
    spark.stop()
  }
}
