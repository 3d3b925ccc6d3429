package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix-array construction by prefix doubling
  * (Manber & Myers, SIAM J. Comput. 1993; the sort/rank formulation used
  * by every shared-nothing SA builder). The suffix array is the index
  * behind EXACT substring deduplication of training corpora (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL'22
  * builds one over the whole corpus) — the catalog's window-hash /
  * winnowing substring paths are the probabilistic counterpart, this is
  * the exact structure.
  *
  * Reference scope: the reference's pipelines stop at per-key
  * aggregation (k8s/spark-apps/kafka-spark-configmap.yaml:106-199);
  * suffix indexing is part of the training-data extension surface.
  *
  * Algorithm, entirely in equi-joins + aggregations (no suffix is ever
  * materialized): rank every position by its first character, then
  * ⌈log₂ maxLen⌉ doubling rounds — round k re-ranks positions by the
  * pair (rank of s[p..p+k), rank of s[p+k..p+2k)), where the second
  * component comes from a self-equi-join on (doc, pos+k) and positions
  * past the end take a −1 sentinel (a proper prefix sorts before every
  * extension, matching binary string order). After the final round two
  * positions share a rank iff their suffixes are IDENTICAL — dense
  * ranks over full suffix content, cross-document.
  *
  * The global dense rank each round reuses the catalog's
  * bucket-plus-driver-prefix-sum shape (Sharding.globalOrder): distinct
  * (r, r2) pairs bucket by `r DIV blockSize` (monotone in the pair
  * order, so bucket boundaries are exact global-order boundaries),
  * per-bucket window ranks are offset by the driver prefix sum of
  * per-bucket distinct counts — never a single-partition sort over the
  * data. Driver state per round is one ≤`buckets`-row count array; rank
  * state is cut with an eagerly-materialized local checkpoint per round
  * (the [[Clustering]] lineage discipline — predecessors freed as soon
  * as the successor lands, two snapshots resident regardless of round
  * count).
  *
  * Scale shape: O(total chars) rows carried through ⌈log₂ maxLen⌉
  * rounds of {1 equi-join on (doc,pos), 1 distinct, 1 bucketed window,
  * 1 equi-join back} — every stage hash-partitioned, no all-pairs, no
  * global sort. On a cluster swap the local checkpoint for a
  * fault-tolerant `checkpoint()`.
  */
object Suffix {

  /** (id, pos, srank) for every character position of every non-empty
    * document: `srank` is the 0-based dense rank of the suffix starting
    * at 1-based `pos` under binary string order, ties iff suffixes are
    * byte-identical. Equals DuckDB's `dense_rank() OVER (ORDER BY
    * substr(text, pos))` — the brute-force oracle this never computes.
    */
  def suffixRanks(
      docs: DataFrame,
      id: String,
      text: String,
      buckets: Int = 512): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import org.apache.spark.sql.graftbridge.GraftBridge.localCheckpointHandle
    val spark = docs.sparkSession
    val base = docs.filter(length(col(text)) >= 1)
      .select(col(id).as("did"), col(text).as("txt"))
    val chars0 = base
      .select(col("did"), explode(sequence(lit(1), length(col("txt")))).as("pos"),
        col("txt"))
      .select(col("did"), col("pos").cast("long").as("pos"),
        expr("substring(txt, pos, 1)").as("ch"))
    // alphabet ranks: the one intentionally tiny single-partition window
    // (distinct characters — bounded by the alphabet, not the corpus)
    val alphabet = chars0.select(col("ch")).distinct()
      .withColumn("r", dense_rank().over(Window.orderBy(col("ch")))
        .cast("long") - 1)
    val maxLenRow = base.agg(max(length(col("txt")))).head
    val maxLen = if (maxLenRow.isNullAt(0)) 0L else maxLenRow.getInt(0).toLong
    val n = chars0.count() // rank domain bound: every round's ranks < n
    val blockSize = n / buckets + 1
    var (p, pRdd) = localCheckpointHandle(
      chars0.join(broadcast(alphabet), Seq("ch"))
        .select(col("did"), col("pos"), col("r")))
    var k = 1L
    while (k < maxLen) {
      // r2 = rank of the suffix k positions ahead (-1 past the end)
      val shifted = p.select(col("did"), (col("pos") - k).as("pos"),
        col("r").as("r2"))
      val keyed = p.join(shifted, Seq("did", "pos"), "left")
        .select(col("did"), col("pos"), col("r"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      val dPairs = keyed.select(col("r"), col("r2")).distinct()
        .withColumn("bkt", expr(s"r DIV $blockSize"))
      val counts = dPairs.groupBy(col("bkt")).count().collect()
        .map(row => (row.getLong(0), row.getLong(1))).sortBy(_._1)
      var acc = 0L
      val offRows = counts.map { case (b, c) => val o = acc; acc += c; Row(b, o) }
      val offDf = spark.createDataFrame(
        java.util.Arrays.asList(offRows: _*),
        StructType(Seq(StructField("bkt", LongType), StructField("off", LongType))))
      val ranked = dPairs.join(broadcast(offDf), Seq("bkt"))
        .withColumn("nr", col("off") +
          dense_rank().over(
            Window.partitionBy(col("bkt")).orderBy(col("r"), col("r2")))
            .cast("long") - 1)
        .select(col("r"), col("r2"), col("nr"))
      val (np, npRdd) = localCheckpointHandle(
        keyed.join(ranked, Seq("r", "r2"))
          .select(col("did"), col("pos"), col("nr").as("r")))
      pRdd.unpersist(blocking = false)
      p = np
      pRdd = npRdd
      k *= 2
    }
    p.select(col("did").as(id), col("pos"), col("r").as("srank"))
  }
}
