package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix-array construction by prefix doubling
  * (Manber & Myers, SIAM J. Comput. 1993; the sort/rank formulation used
  * by every shared-nothing SA builder), plus the rank-adjacent LCP table
  * derived from the kept doubling levels. Together they are the index
  * behind EXACT substring deduplication of training corpora (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL'22
  * builds exactly this pair over the whole corpus: a span is duplicated
  * at length ≥ L iff some rank-adjacent suffix pair has LCP ≥ L) — the
  * catalog's window-hash / winnowing substring paths are the
  * probabilistic counterpart, this is the exact structure.
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

  import org.apache.spark.sql.graftbridge.GraftBridge.localCheckpointHandle

  private final case class Level(
      df: DataFrame, // (did, pos, r): rank of the prefix of length 2^j
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow])

  /** Runs the doubling rounds. `levels(j)` ranks length-2^j prefixes;
    * the last level is the full-suffix rank. With `keepLevels = false`
    * predecessors are freed as soon as their successor materializes.
    */
  private def build(
      docs: DataFrame,
      id: String,
      text: String,
      buckets: Int,
      keepLevels: Boolean): Seq[Level] = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
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
    val init = localCheckpointHandle(
      chars0.join(broadcast(alphabet), Seq("ch"))
        .select(col("did"), col("pos"), col("r")))
    var levels = Vector(Level(init._1, init._2))
    var k = 1L
    while (k < maxLen) {
      val p = levels.last.df
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
      val next = localCheckpointHandle(
        keyed.join(ranked, Seq("r", "r2"))
          .select(col("did"), col("pos"), col("nr").as("r")))
      if (!keepLevels) levels.last.rdd.unpersist(blocking = false)
      levels = levels :+ Level(next._1, next._2)
      k *= 2
    }
    levels
  }

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
      buckets: Int = 512): DataFrame =
    build(docs, id, text, buckets, keepLevels = false).last.df
      .select(col("did").as(id), col("pos"), col("r").as("srank"))

  /** The LCP table over rank-ADJACENT suffixes — the dedup half of the
    * index: a substring of length ≥ L occurs twice in the corpus iff
    * some row here has `lcp` ≥ L (suffix-array adjacency property).
    * Rows are (srank, doc_a, pos_a, doc_b, pos_b, lcp): the
    * (doc,pos)-minimal representative of rank `srank` against that of
    * rank `srank`+1 (any representative works — equal ranks mean
    * byte-identical suffixes) and the exact length of their longest
    * common prefix.
    *
    * LCP is computed from the KEPT doubling levels, never from suffix
    * strings: walk j = top…0 and extend by 2^j exactly when both sides'
    * level-j ranks at the current offsets exist and agree. Soundness of
    * each step: equal level-j ranks with BOTH suffixes shorter than 2^j
    * would force identical full suffixes (same srank — excluded), so
    * agreement certifies 2^j further equal characters; conversely a
    * remaining common prefix ≥ 2^j forces level-j agreement, so the
    * greedy binary decomposition is exact. Each level is two broadcast-
    * free equi-joins of the pair table against that level's rank table
    * on (doc, pos+acc) — ⌈log₂ maxLen⌉ levels, pair count < distinct
    * suffix count, everything hash-partitioned.
    */
  def adjacentLcp(
      docs: DataFrame,
      id: String,
      text: String,
      buckets: Int = 512): DataFrame = {
    val levels = build(docs, id, text, buckets, keepLevels = true)
    val sr = levels.last.df
    val reps = sr.groupBy(col("r"))
      .agg(min(struct(col("did"), col("pos"))).as("m"))
      .select(col("r"), col("m.did").as("did"), col("m.pos").as("pos"))
    val pairs = reps
      .select(col("r").as("srank"), col("did").as("da"), col("pos").as("pa"))
      .join(reps.select((col("r") - 1).as("srank"),
        col("did").as("db"), col("pos").as("pb")), Seq("srank"))
    var st = pairs.withColumn("acc", lit(0L))
    var stRdd: Option[org.apache.spark.rdd.RDD[
      org.apache.spark.sql.catalyst.InternalRow]] = None
    // the top level (2^J >= maxLen) can never fire: agreement there
    // needs either 2^J remaining equal chars (suffixes are shorter —
    // except two full-length identical docs, whose suffixes share a
    // rank and are excluded from pairs) or two equal truncated
    // remainders (identical suffixes, same exclusion). LCP <= maxLen-1
    // is covered by powers 2^0..2^(J-1), so skip one walk round.
    val walkLevels =
      if (levels.size >= 2) levels.indices.dropRight(1) else levels.indices
    for (j <- walkLevels.reverse) {
      val ell = 1L << j
      val la = levels(j).df.select(
        col("did").as("_dxa"), col("pos").as("_qxa"), col("r").as("_ra"))
      val lb = levels(j).df.select(
        col("did").as("_dxb"), col("pos").as("_qxb"), col("r").as("_rb"))
      val stepped = st
        .join(la, col("da") === col("_dxa") &&
          col("_qxa") === col("pa") + col("acc"), "left")
        .join(lb, col("db") === col("_dxb") &&
          col("_qxb") === col("pb") + col("acc"), "left")
        .withColumn("acc", col("acc") +
          when(col("_ra").isNotNull && col("_ra") === col("_rb"), ell)
            .otherwise(0L))
        .select(col("srank"), col("da"), col("pa"), col("db"), col("pb"),
          col("acc"))
      // cut lineage per level: the walk would otherwise stack 2·levels
      // joins into one plan; keep two pair-table snapshots resident
      val h = localCheckpointHandle(stepped)
      stRdd.foreach(_.unpersist(blocking = false))
      st = h._1
      stRdd = Some(h._2)
    }
    levels.foreach(_.rdd.unpersist(blocking = false))
    st.select(col("srank"), col("da").as("doc_a"), col("pa").as("pos_a"),
      col("db").as("doc_b"), col("pb").as("pos_b"), col("acc").as("lcp"))
  }
}
