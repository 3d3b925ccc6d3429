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
    // q_dup_spans' production parameters (Queries.MinSpan / LcpCap)
    val (minSpan, cap) = (20L, 64L)
    if (args.isEmpty) {
      val docs = all.filter(col("doc_id") < 500)
      for (r <- 1 to 2) {
        time(s"ranks-$r")(
          graft.functions.Suffix.suffixRanks(docs, "doc_id", "text").count())
        time(s"lcp-$r")(
          graft.functions.Suffix.adjacentLcp(docs, "doc_id", "text").count())
        time(s"dupspans-$r")(
          graft.functions.Suffix.dupSpans(docs, "doc_id", "text", minSpan, cap)
            .count())
      }
    } else if (args.head == "concat") {
      // width-growth regime study (maxLen far beyond the corpus's own
      // ~600 chars): concatenate groups of k testdata docs into one doc
      // — maxLen ≈ 300·k avg / 650·k max — and count the densify
      // actions the doubling ladder pays (run with GRAFT_SUFFIX_PROF=1
      // to see the per-densify PROF lines). Doc count is held at 500.
      args.tail.map(_.toInt).foreach { k =>
        val docs = all.filter(col("doc_id") < 500L * k)
          .groupBy((col("doc_id") / k).cast("long").as("doc_id"))
          .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
        val st = docs.agg(sum(length(col("text"))), max(length(col("text")))).head()
        val (chars, maxLen) = (st.getLong(0), st.getInt(1))
        def mintime(label: String)(f: => Any): Double = {
          val a = time(s"$label-a")(f); val b = time(s"$label-b")(f)
          math.min(a, b)
        }
        val ra = mintime(s"ranks@x$k")(
          graft.functions.Suffix.suffixRanks(docs, "doc_id", "text").count())
        val lc = mintime(s"lcp@x$k")(
          graft.functions.Suffix.adjacentLcp(docs, "doc_id", "text",
            maxLcp = 64L).count())
        println(f"CONCAT k=$k chars=$chars maxLen=$maxLen " +
          f"ranks=$ra%.2f lcp64=$lc%.2f")
      }
    } else {
      // GRAFT_SUFFIX_BUCKETS overrides the 512-bucket default — the
      // bucket-count sensitivity probe for bounded slices (512 tiny
      // tasks per round is scheduling overhead at 32 threads)
      val buckets = sys.env.get("GRAFT_SUFFIX_BUCKETS").map(_.toInt).getOrElse(512)
      args.map(_.toLong).foreach { bound =>
        val docs = all.filter(col("doc_id") < bound)
        val chars = docs.agg(sum(length(col("text")))).head().getLong(0)
        def mintime(label: String)(f: => Any): Double = {
          val a = time(s"$label-a")(f); val b = time(s"$label-b")(f)
          math.min(a, b)
        }
        val ra = mintime(s"ranks@$bound")(
          graft.functions.Suffix.suffixRanks(docs, "doc_id", "text", buckets)
            .count())
        val lc = mintime(s"lcp@$bound")(
          graft.functions.Suffix.adjacentLcp(docs, "doc_id", "text", buckets)
            .count())
        val ds = mintime(s"dupspans@$bound")(
          graft.functions.Suffix.dupSpans(docs, "doc_id", "text", minSpan, cap,
            buckets).count())
        println(f"GROWTH docs=$bound chars=$chars buckets=$buckets " +
          f"ranks=$ra%.2f lcp=$lc%.2f dupspans=$ds%.2f")
      }
    }
    spark.stop()
  }
}
