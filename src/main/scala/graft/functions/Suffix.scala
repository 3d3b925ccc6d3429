package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Algorithm (no suffix is ever materialized): rank every position by
  * its first TWO characters (2-gram alphabet is bounded by |alphabet|²,
  * so its rank table is a broadcast, and the 2-char start drops one
  * doubling round), then ~log₂ maxLen doubling rounds — round k
  * re-ranks positions by the pair (rank of s[p..p+k), rank of
  * s[p+k..p+2k)), where positions past the end take a −1 sentinel (a
  * proper prefix sorts before every extension, matching binary string
  * order). After the final round two positions share a rank iff their
  * suffixes are IDENTICAL — dense ranks over full suffix content,
  * cross-document.
  *
  * The constant factor is engineered around three facts:
  *
  *   - '''the shift lookup is a window, not a join.''' Positions are
  *     consecutive 1..len within a document, so "rank k positions
  *     ahead" is exactly `lead(r, k) OVER (PARTITION BY did ORDER BY
  *     pos)` — one pipelined pass, no self-join, no shuffle at all once
  *     the state is hash-partitioned by document id (the local
  *     checkpoint preserves that partitioning via
  *     `LogicalRDD.fromDataset`). Requires a document's positions to be
  *     co-located — fine for bounded-length documents (the regime of
  *     corpus dedup); a single multi-TB "document" would need the join
  *     formulation instead.
  *   - '''combine rounds are arithmetic, then widen.''' Doubling needs
  *     only ORDER-ISOMORPHIC ranks, not dense ones, so while the domain
  *     `dom` satisfies (dom+1)(dom+2) ≤ 2⁶³−1 (checked in BigInt on the
  *     driver; the true 2-gram domain is probed once from the cached
  *     init level so the first densify is deferred as long as
  *     possible), the new rank is the pure map `r·(dom+2) + r2 + 2` —
  *     consecutive combine rounds are chained windows in ONE stage.
  *     When the pack would overflow, the rank GROWS to a lexicographic
  *     multi-column tuple (up to [[MaxWidth]] longs) instead of paying
  *     a densify — still a pure chained window, so densify jobs (the
  *     family's fixed-cost floor) fire only every ~⌈log₂ MaxWidth⌉+1
  *     rounds and on the final round.
  *   - '''densify rounds are one action with in-plan offsets.''' When
  *     the arithmetic would overflow (and on the final round, whose
  *     output must be dense): pre-shuffle once on (r, r2) — shared by
  *     the distinct AND the join-back — then distinct pairs bucket by
  *     `r DIV blockSize` (monotone in the pair order, so bucket
  *     boundaries are exact global-order boundaries), per-bucket window
  *     ranks are offset by a prefix sum over the ≤`buckets`-row
  *     per-bucket counts (a single-partition window over the bucket
  *     aggregate — bounded by `buckets`, never by data) — no driver
  *     collect, no recompute. The result is repartitioned back to the
  *     document id to keep the zero-exchange window invariant.
  *
  * Driver state per round: the BigInt domain bound — nothing else.
  * Dense state is cut with an eagerly-materialized local checkpoint
  * (the [[Clustering]] lineage discipline — predecessors freed as soon
  * as the successor lands, two snapshots resident regardless of round
  * count).
  *
  * Scale shape: O(total chars) rows carried through ~log₂ maxLen
  * rounds, each either {1 window pass} (combine) or {1 window pass,
  * 1 distinct, 1 bucketed window, 1 equi-join back} (densify) — every
  * stage hash-partitioned, no all-pairs, no global sort, no per-round
  * driver barrier. On a cluster swap the local checkpoint for a
  * fault-tolerant `checkpoint()`.
  */
object Suffix {

  import org.apache.spark.sql.graftbridge.GraftBridge.localCheckpointHandle

  private val Prof = sys.env.contains("GRAFT_SUFFIX_PROF")
  private def prof[A](label: => String)(f: => A): A =
    if (!Prof) f
    else {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

  /** Hash-repartition with an EXPLICIT partition count (the session's
    * `spark.sql.shuffle.partitions`, i.e. the conf the driver/cluster
    * operator sizes): a bare `repartition(col)` leaves the count to AQE,
    * whose coalescing is BYTE-based and blind to two properties of this
    * ladder — (1) the pre-explode doc shuffle is ~1 byte/char but the
    * explode amplifies rows ~avg-doc-length×, so sizing partitions on
    * the exchange's bytes serializes the compute-bound stage after it
    * (round-15 stage audit: the 0.9 MB doc exchange coalesced to ONE
    * partition and the 1.5M-row explode+join ran single-threaded,
    * 3.3 s); (2) a coalesced exchange reports a partitioning the
    * checkpoint cannot preserve as hash(key), so every downstream
    * consumer of the cached state re-shuffled it (55 + 45 MB
    * re-exchanges of the already-bucketed kb state). Explicit counts
    * keep the exchange recognizable and the post-shuffle parallelism
    * sized by configuration, not by pre-amplification bytes.
    */
  private def repartitionFixed(df: DataFrame, c: org.apache.spark.sql.Column)
      : DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, c)

  private final case class Level(
      df: DataFrame, // (did, pos, r): rank of the prefix of length `len`
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      len: Long)

  private val MaxDom = BigInt(Long.MaxValue)

  /** Runs the doubling rounds. `levels` ranks prefixes of length
    * `level.len` (equal ranks iff equal length-`len` prefixes — combine
    * levels are order-isomorphic, not dense, which is all the walk and
    * the next round need); the last level is the full-suffix DENSE
    * rank. With `keepLevels = false` only densify outputs materialize
    * (combine windows chain lazily into the next densify) and
    * predecessors are freed as soon as their successor lands; with
    * `keepLevels = true` every level is checkpointed (the LCP walk
    * reads each one) and a character-level (len = 1) table is prepended
    * so the walk can decompose odd lengths.
    */
  /** `maxPrefix` truncates the ranking: ranks are computed over the
    * first `maxPrefix` characters of each suffix only (equal ranks iff
    * equal padded `maxPrefix`-prefixes), cutting the doubling ladder to
    * ~log₂ maxPrefix rounds regardless of document length. Callers that
    * only consume rank EQUALITY up to a known horizon ([[dupSpans]],
    * whose span arithmetic saturates at its cap) use this to skip the
    * deep rounds — and their densifies — entirely; the default keeps
    * full-suffix ranking ([[suffixRanks]] / [[adjacentLcp]]'s output
    * contract).
    *
    * `keepUpTo` bounds which PENDING combine levels are kept when
    * `keepLevels` is set: a capped LCP walk only reads levels of length
    * ≤ its cap, so deeper combine ranks need not be carried as extra
    * columns through the final densify's shuffle nor materialized in its
    * checkpoint — the final (dense) level is always kept regardless.
    */
  private def build(
      docs: DataFrame,
      id: String,
      text: String,
      buckets: Int,
      keepLevels: Boolean,
      maxPrefix: Long = Long.MaxValue,
      keepUpTo: Long = Long.MaxValue): Seq[Level] = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = docs.filter(length(col(text)) >= 1)
      .select(col(id).as("did"), col(text).as("txt"))
    // hash-partition the WHOLE DOCUMENTS by id — BEFORE the explode.
    // Generate/Project/BroadcastHashJoin all preserve the child's
    // partitioning, so the exploded positions, their 2-grams and the
    // joined gram ranks are already clustered by did and every window
    // pass below runs exchange-free (partitioning preserved across
    // checkpoints too). This replaces the previous post-explode
    // exchange of (did, pos, 2 chars) — ~24 bytes per character — with
    // a pre-explode exchange of the raw text at ~1 byte per character,
    // and it parallelizes the explode+join across the full core count
    // instead of the scan's few input splits (the docs table is one
    // small parquet split at the gate SFs, so everything upstream of
    // the first exchange used to run near-serial). The previous shape
    // additionally shipped the exploded table through the did exchange
    // TWICE — the alphabet branch's copy of the exchange is
    // column-pruned differently and AQE stage reuse keys on the exact
    // subtree (round-15 CP-plan audit: two
    // `Exchange hashpartitioning(did)` nodes per init action); here
    // the duplicated branch carries only the pre-explode docs.
    val posed = repartitionFixed(base, col("did"))
      .select(col("did"), explode(sequence(lit(1), length(col("txt")))).as("pos"),
        col("txt"))
      .select(col("did"), col("pos").cast("long").as("pos"),
        expr("substring(txt, pos, 2)").as("g2"))
    // gram ranks: the intentionally tiny single-partition windows
    // (distinct 1/2-grams — bounded by the alphabet, not the corpus).
    // When the walk needs BOTH the 1-gram and 2-gram levels they are
    // materialized as two views over ONE checkpointed table (one
    // action, one cached copy) — Level.df is just a projection.
    val a2base = posed.select(col("g2").as("g")).distinct()
    def ranked2(df: DataFrame): DataFrame =
      df.withColumn("r", dense_rank().over(Window.orderBy(col("g")))
        .cast("long") - 1)
    val init =
      if (keepLevels) {
        // the 1-gram alphabet is exactly the distinct first characters
        // of the 2-gram alphabet (every position's 1-gram prefixes its
        // 2-gram), so it derives from a2base's ALREADY-SHUFFLED output
        // (tiny second distinct over ≤|alphabet|² rows, exchange reused)
        val a1 = ranked2(a2base.select(expr("substring(g, 1, 1)").as("g"))
          .distinct())
          .select(col("g").as("g1"), col("r").as("r_1"))
        val a2 = ranked2(a2base)
          .select(col("g").as("g2"), col("r").as("r_2"))
        prof("init12")(localCheckpointHandle(
          posed.withColumn("g1", expr("substring(g2, 1, 1)"))
            .join(broadcast(a1), Seq("g1"))
            .join(broadcast(a2), Seq("g2"))
            .select(col("did"), col("pos"), col("r_1"), col("r_2")),
          Seq("did")))
      } else {
        val a2 = ranked2(a2base)
          .select(col("g").as("g2"), col("r").as("r_2"))
        prof("init2")(localCheckpointHandle(
          posed
            .join(broadcast(a2), Seq("g2"))
            .select(col("did"), col("pos"), col("r_2")),
          Seq("did")))
      }
    val init2df =
      init._1.select(col("did"), col("pos"), col("r_2").as("r"))
    var levels =
      if (keepLevels)
        Vector(
          Level(init._1.select(col("did"), col("pos"), col("r_1").as("r")),
            init._2, 1L),
          Level(init2df, init._2, 2L))
      else Vector(Level(init2df, init._2, 2L))
    // ONE tiny probe job over the cached init table: longest document
    // (loop bound), total characters (the bound every densify round
    // re-compresses ranks below), and the TRUE |2-grams| — deciding
    // combine capacity off the real 2-gram domain instead of the safe
    // bound n usually buys two extra combines before the first densify
    val pr = prof("probe")(init._1.agg(
      max(col("pos")), count(lit(1)), max(col("r_2"))).head)
    val docLen = if (pr.isNullAt(0)) 0L else pr.getLong(0)
    // the ladder only needs to distinguish the first maxPrefix chars
    val maxLen = math.min(docLen, maxPrefix)
    val n = pr.getLong(1)
    require(maxLen <= Int.MaxValue, "rank horizon exceeds lead() range")
    var dom: BigInt =
      BigInt(if (pr.isNullAt(2)) 1L else math.max(pr.getLong(2) + 1L, 1L))
    val byDoc = Window.partitionBy(col("did")).orderBy(col("pos"))
    // loop state: the rank of the length-k prefix is carried as W
    // lexicographically-compared long columns r0..r{W-1} (W = 1 after
    // init and after every densify). Widening is the SECOND overflow
    // valve: when the arithmetic pack would overflow int64, the round
    // appends the led tuple as extra columns instead of densifying —
    // (A, B) with A of fixed width W compares exactly like the pair
    // (rank at p, rank at p+k), so the tuple stays order-isomorphic,
    // and the round is still a pure chained window (no action, no
    // shuffle). Only when the width would exceed MaxWidth (or on the
    // final round, whose output must be dense) does a densify job run
    // — at MaxWidth = 4 that is TWO densify actions for maxLen ≈ 512
    // instead of the four the arithmetic-only ladder paid, and each
    // extra column is 8 bytes/row through one bucket shuffle.
    var cur = levels.last.df.withColumnRenamed("r", "r0")
    var width = 1
    var lastCp = levels.last.rdd
    // combine levels not yet materialized, carried as named extra
    // columns of `cur` until the next densify checkpoints them all in
    // ONE action (each then becomes a projection view of that table)
    var pending = Vector.empty[(String, Long)]
    var curMaterialized = true
    var k = 2L
    while (k < maxLen) {
      // s0..s{W-1} = rank tuple of the prefix k positions ahead (all
      // -1 past the end — sorts before every real tuple, so a proper
      // prefix sorts before its extensions): positions are consecutive
      // within a document, so this is a pure window lead — no self-join
      val rCols = (0 until width).map(i => s"r$i")
      val sCols = (0 until width).map(i => s"s$i")
      val keyed = rCols.zip(sCols).foldLeft(cur) { case (df, (r, s2)) =>
        df.withColumn(s2, coalesce(lead(col(r), k.toInt).over(byDoc), lit(-1L)))
      }
      val isLast = 2 * k >= maxLen
      val combined = (dom + 1) * (dom + 2)
      // if `cur`'s top rank (prefix length k) is itself unmaterialized,
      // keep it as a named pending column through this round
      def carryCols: Seq[org.apache.spark.sql.Column] = {
        val keep =
          if (keepLevels && !curMaterialized && k <= keepUpTo) {
            pending = pending :+ (s"rl$k", k)
            Seq((if (width == 1) col("r0")
            else struct(rCols.map(col): _*)).as(s"rl$k"))
          } else Nil
        Seq(col("did"), col("pos")) ++ pending.dropRight(keep.size)
          .map { case (nm, _) => col(nm) } ++ keep
      }
      if (!isLast && width == 1 && combined <= MaxDom) {
        // combine: arithmetic order-isomorphic rank — one chained
        // window pass. s0+2 ∈ [1, dom+1] < dom+2 ⇒ no carry collision.
        val d = dom.toLong
        dom = combined
        cur = keyed.select(carryCols :+
          (col("r0") * (d + 2) + col("s0") + 2).as("r0"): _*)
        curMaterialized = false
      } else if (!isLast && 2 * width <= MaxWidth) {
        // widen: the concatenated (r tuple, led tuple) IS the combined
        // rank, compared lexicographically — zero extra passes. `dom`
        // (the domain of r0, the bucketing major key) is unchanged:
        // r0 is still the same column.
        cur = keyed.select(carryCols ++
          rCols.map(col) ++
          sCols.zipWithIndex.map { case (s2, i) => col(s2).as(s"r${width + i}") }: _*)
        width *= 2
        curMaterialized = false
      } else {
        // densify. Shared structure: bucket by the major key (bkt =
        // r0 DIV blockSize is monotone in the pair order — and in the
        // full tuple order, since r0 is its first component), shuffle
        // once on bkt, and rank per bucket with a window DIRECTLY over
        // the full rows — per-bucket dense_rank over
        // rows-with-duplicates equals dense_rank over the distinct
        // tuples, so the previous shape's distinct-pairs table and its
        // sort-merge join BACK onto the state were pure overhead (that
        // join-back also self-referenced the bucketed state, and the
        // analyzer's self-join expr-id dedup plus divergent column
        // pruning produced THREE non-reusable instantiations of the
        // bucket exchange — round-15 CP-plan audit: 3×
        // `Exchange hashpartitioning(bkt)` at ~45-55 MB shuffle write
        // each, per densify, at sf0.1).
        //
        // INTERMEDIATE densifies (the overflow valve) need only an
        // ORDER-ISOMORPHIC compression, not a dense one — the next
        // combine round just packs it arithmetically. `bkt·(n+1) + rk`
        // is order-isomorphic (bkt is the major order; rk ≤ n within a
        // bucket) with domain ≤ (buckets+1)·(n+1), so the cross-bucket
        // offset machinery (per-bucket distinct counts, prefix-sum
        // window, broadcast join) drops out entirely: ONE action, one
        // bkt exchange, one window, one did exchange.
        //
        // The FINAL round's output must be dense (the suffix-rank
        // contract): there the per-bucket ranks are offset by the
        // prefix sum of per-bucket distinct counts — in-plan (a
        // bounded-by-`buckets` aggregate + single-partition window),
        // no driver collect. The bucketed state is consumed twice
        // (rank window + offset aggregate), so it is eagerly
        // checkpointed once; the offs branch then reads the cached
        // copy instead of re-instantiating the exchange.
        val tupleCols = rCols ++ sCols
        val blockSize = ((dom / buckets) + 1).min(MaxDom).toLong
        val rkW = Window.partitionBy(col("bkt")).orderBy(tupleCols.map(col): _*)
        val nn = math.max(n, 1L)
        val h =
          if (!isLast) {
            val packedDom = (BigInt(buckets) + 1) * (BigInt(nn) + 1)
            require(packedDom <= MaxDom,
              s"packed intermediate rank domain $packedDom overflows int64 " +
                s"(n=$n, buckets=$buckets) — lower the bucket count")
            dom = packedDom
            prof(s"densify-packed k=$k")(localCheckpointHandle(
              repartitionFixed(
                repartitionFixed(
                  keyed.withColumn("bkt", expr(s"r0 DIV $blockSize")),
                  col("bkt"))
                  .withColumn("rk", dense_rank().over(rkW).cast("long"))
                  .select(carryCols :+
                    (col("bkt") * (nn + 1) + col("rk") - 1).as("r0"): _*),
                col("did")),
              Seq("did")))
          } else {
            dom = BigInt(nn)
            val (kb, kbRdd) = prof(s"densify-kb k=$k")(localCheckpointHandle(
              repartitionFixed(
                keyed.withColumn("bkt", expr(s"r0 DIV $blockSize")),
                col("bkt")),
              Seq("bkt")))
            val rk = kb.withColumn("rk", dense_rank().over(rkW).cast("long"))
            // per-bucket distinct-tuple counts straight off the cached
            // state (no dependence on the rank window, so the broadcast
            // subtree never recomputes it)
            val offs = kb.groupBy(col("bkt"))
              .agg(count_distinct(col(tupleCols.head),
                tupleCols.tail.map(col): _*).as("cnt"))
              .withColumn("off",
                coalesce(sum(col("cnt")).over(
                  Window.orderBy(col("bkt"))
                    .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
              .select(col("bkt"), col("off"))
            val outCols = carryCols :+ (col("off") + col("rk") - 1).as("r0")
            val hh = prof(s"densify k=$k")(localCheckpointHandle(
              repartitionFixed(
                rk.join(broadcast(offs), Seq("bkt")).select(outCols: _*),
                col("did")),
              Seq("did")))
            kbRdd.unpersist(blocking = false)
            hh
          }
        if (!keepLevels) lastCp.unpersist(blocking = false)
        // every pending combine level materialized with this action:
        // emit each as a projection view of the one checkpointed table
        levels = levels ++ pending.map { case (nm, len) =>
          Level(h._1.select(col("did"), col("pos"), col(nm).as("r")),
            h._2, len)
        }
        pending = Vector.empty
        curMaterialized = true
        width = 1
        cur = h._1.select(col("did"), col("pos"), col("r0"))
        levels = levels :+ Level(
          h._1.select(col("did"), col("pos"), col("r0").as("r")), h._2, 2 * k)
        lastCp = h._2
      }
      k *= 2
    }
    levels
  }

  /** Widest rank tuple carried between densifies: 4 long columns = 32
    * bytes/row of shuffle weight through the next densify, in exchange
    * for halving the number of densify ACTIONS (the suffix family's
    * dominant fixed cost — each is a multi-stage job regardless of data
    * volume).
    */
  val MaxWidth: Int = 4

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
    * strings: walk the levels top…1-gram and extend by `level.len`
    * exactly when both sides' ranks at the current offsets exist and
    * agree. Soundness of each step: equal level ranks with BOTH
    * suffixes shorter than `len` would force identical full suffixes
    * (same srank — excluded), so agreement certifies `len` further
    * equal characters; conversely a remaining common prefix ≥ `len`
    * forces level agreement, so the greedy decomposition over lengths
    * {top…4, 2, 1} is exact (combine levels are order-isomorphic, and
    * the walk only tests EQUALITY, which they preserve). Each level is
    * two equi-joins of the pair table against that level's rank table
    * on (doc, pos+acc) — ~log₂ maxLen levels, pair count < distinct
    * suffix count, everything hash-partitioned; lineage is cut every
    * few levels and levels are freed as soon as the walk state has
    * materialized past them.
    *
    * `maxLcp` caps the walk: only levels of length ≤ maxLcp are
    * consumed, so with maxLcp = 2^j the walk visits j+1 levels instead
    * of ~log₂ maxLen. The capped contract is exact under the cap —
    * `least(lcp, maxLcp)` equals the true capped LCP for EVERY pair
    * (the kept levels sum to 2^(j+1)−1 ≥ maxLcp, so any true LCP <
    * maxLcp decomposes exactly and any ≥ maxLcp accumulates ≥ maxLcp)
    * — which is precisely what a dedup threshold query consumes: "is
    * this span duplicated at ≥ L chars" never needs the LCP beyond L.
    */
  def adjacentLcp(
      docs: DataFrame,
      id: String,
      text: String,
      buckets: Int = 512,
      maxLcp: Long = Long.MaxValue): DataFrame = {
    require(maxLcp >= 1, s"maxLcp must be >= 1, got $maxLcp")
    val levels = build(docs, id, text, buckets, keepLevels = true,
      keepUpTo = maxLcp)
    lcpWalk(levels, repsOf(levels.last.df), maxLcp, protectLast = false)._1
  }

  /** [[adjacentLcp]] with the LCP CLAMPED at `maxLcp` — the shape a
    * threshold consumer (`least(lcp, cap)`) actually needs, computed
    * WITHOUT the level walk: a cap-clamped LCP is one codegen'd
    * character comparison of the two `maxLcp`-char suffix slices of
    * each adjacent-rank representative pair (the [[dupSpans]]
    * equivalence: true LCP < cap is measured exactly by both the walk
    * and the slice compare; true LCP ≥ cap saturates both). Dropping
    * the walk drops its ~log₂ cap levels × 2 equi-joins, the kept-level
    * carries through the ladder's densifies, and the 1-gram init level
    * (`keepLevels = false` — the build is exactly [[suffixRanks]]'s).
    * Output identical to
    * `adjacentLcp(maxLcp = cap).withColumn("lcp", least(lcp, cap))`
    * (spec-pinned); `srank` is still the FULL-suffix dense rank.
    */
  def adjacentLcpCapped(
      docs: DataFrame,
      id: String,
      text: String,
      maxLcp: Long,
      buckets: Int = 512): DataFrame = {
    require(maxLcp >= 1 && maxLcp <= Int.MaxValue,
      s"maxLcp must be in [1, Int.MaxValue], got $maxLcp")
    val levels = build(docs, id, text, buckets, keepLevels = false)
    val sr = levels.last.df
    // the per-rank representative is consumed TWICE (both sides of the
    // adjacent-rank self-join) — checkpoint it once, or the analyzer's
    // self-join expr-id dedup re-instantiates the aggregate (and its
    // corpus-sized exchange) per side
    val (reps, _) = localCheckpointHandle(repsOf(sr))
    // the rank table is consumed by nothing else — release it as soon
    // as the representative snapshot has materialized
    levels.last.rdd.unpersist(blocking = false)
    val slices = docs.filter(length(col(text)) >= 1)
      .select(col(id).as("did"), col(text).as("_txt"))
    val capLen = lit(maxLcp.toInt)
    reps.select(col("r").as("srank"), col("did").as("da"), col("pos").as("pa"))
      .join(reps.select((col("r") - 1).as("srank"),
        col("did").as("db"), col("pos").as("pb")), Seq("srank"))
      .join(slices.select(col("did").as("da"), col("_txt").as("_ta")), Seq("da"))
      .select(col("srank"), col("pa"), col("db"), col("pb"),
        col("da"), col("_ta").substr(col("pa").cast("int"), capLen).as("_sa"))
      .join(slices.select(col("did").as("db"), col("_txt").as("_tb")), Seq("db"))
      .select(col("srank"), col("da").as("doc_a"), col("pa").as("pos_a"),
        col("db").as("doc_b"), col("pb").as("pos_b"),
        graft.functions.expressions.NativeExpressions.commonPrefixChars(
          col("_sa"),
          col("_tb").substr(col("pb").cast("int"), capLen)).as("lcp"))
  }

  /** The (doc,pos)-minimal representative of each rank — the walk's pair
    * seeds. Lazy: callers that need nothing else per rank let the walk's
    * first lineage cut materialize it; [[dupSpans]] instead derives it
    * from its checkpointed one-pass rank aggregate (representative AND
    * multiplicity together, so the rank table is aggregated once, not
    * twice).
    */
  private def repsOf(sr: DataFrame): DataFrame =
    sr.groupBy(col("r"))
      .agg(min(struct(col("did"), col("pos"))).as("m"))
      .select(col("r"), col("m.did").as("did"), col("m.pos").as("pos"))

  /** The LCP walk over kept doubling levels (semantics documented at
    * [[adjacentLcp]]). `reps` is the per-rank representative table
    * (schema (r, did, pos), one row per rank — [[repsOf]] or a
    * projection of a richer per-rank aggregate). With `protectLast` the
    * final rank level's checkpoint — and any level sharing its table —
    * survives the walk's freeing discipline, for callers ([[dupSpans]])
    * that keep consuming the rank table after the walk.
    */
  private def lcpWalk(
      levels: Seq[Level],
      reps: DataFrame,
      maxLcp: Long,
      protectLast: Boolean): (DataFrame,
      Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]]) = {
    val pairs = reps
      .select(col("r").as("srank"), col("did").as("da"), col("pos").as("pa"))
      .join(reps.select((col("r") - 1).as("srank"),
        col("did").as("db"), col("pos").as("pb")), Seq("srank"))
    var st = pairs.withColumn("acc", lit(0L))
    var stRdd: Option[org.apache.spark.rdd.RDD[
      org.apache.spark.sql.catalyst.InternalRow]] = None
    // the top level (len >= maxLen) can never fire: agreement there
    // needs either `len` remaining equal chars (suffixes are shorter —
    // except two full-length identical docs, whose suffixes share a
    // rank and are excluded from pairs) or two equal truncated
    // remainders (identical suffixes, same exclusion). LCP <= maxLen-1
    // is covered by the lengths {top/2, …, 2, 1}, so skip one walk
    // round.
    val walkLevels =
      (if (levels.size >= 2) levels.indices.dropRight(1) else levels.indices)
        .filter(i => levels(i).len <= maxLcp)
    var sinceCut = 0
    // levels consumed since the last lineage cut: their checkpointed
    // RDDs are unrecomputable, so they may only be freed once a
    // DOWNSTREAM checkpoint has materialized the walk state past them
    var pendingFree = List.empty[
      org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]]
    for (j <- walkLevels.reverse) {
      val ell = levels(j).len
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
      // cut lineage every FOURTH level (the walk would otherwise stack
      // 2·levels joins into one plan; four levels = eight joins is a
      // fine per-action depth and cuts the materialize jobs to a
      // quarter)
      sinceCut += 1
      // the 1-gram and 2-gram levels are views over one shared cached
      // table: only free an RDD once no LOWER (still-unconsumed) level
      // references it; under `protectLast`, a table hosting the final
      // rank level is never freed here
      if (!levels.indices.take(j).exists(i => levels(i).rdd eq levels(j).rdd)
        && !(protectLast && (levels(j).rdd eq levels.last.rdd)))
        pendingFree ::= levels(j).rdd
      if (sinceCut == 4 || j == walkLevels.head) {
        val h = prof(s"walk j=$j")(localCheckpointHandle(stepped))
        stRdd.foreach(_.unpersist(blocking = false))
        st = h._1
        stRdd = Some(h._2)
        sinceCut = 0
        pendingFree.foreach(_.unpersist(blocking = false))
        pendingFree = Nil
      } else st = stepped
    }
    // final sweep: every level table is consumed by now (the last walk
    // cut materialized the state past all of them, and `reps` was
    // materialized with the first cut) — unpersist is idempotent, so
    // re-freeing walked levels is a no-op and cap-skipped tables that
    // no walked level shares are released here. Under `protectLast`
    // the final rank level's table stays resident for the caller
    // (the suffixRanks contract: one returned cached snapshot).
    levels.map(_.rdd).distinct
      .filterNot(r => protectLast && (r eq levels.last.rdd))
      .foreach(_.unpersist(blocking = false))
    (st.select(col("srank"), col("da").as("doc_a"), col("pa").as("pos_a"),
      col("db").as("doc_b"), col("pb").as("pos_b"), col("acc").as("lcp")),
      stRdd)
  }

  /** Per-document duplicated-REGION accounting — the decision step the
    * suffix index exists for (Lee et al. ACL'22 §4: characters inside
    * any duplicated substring of length ≥ `minSpan` are the removal
    * candidates). One row per non-empty document:
    * (id, n_chars, dup_spans, dup_chars) — the number of maximal
    * duplicated regions and the characters they cover.
    *
    * Exactness under the cap: position p's longest duplicated prefix is
    * `dupLen(p) = max(lcp with rank-neighbors; full suffix length if
    * its rank has ≥ 2 members)` (nearest ranks maximize LCP — the
    * suffix-array property), and the dup region is the union of
    * `[p, p + dupLen(p))` over positions with `dupLen ≥ minSpan`.
    * Capping dupLen at `cap ≥ minSpan` does NOT change the union: any
    * character inside a long duplicated substring is also inside a
    * length-`minSpan` duplicated substring starting ≤ it (substrings
    * of duplicated strings are duplicated), whose start contributes an
    * interval covering it. So the walk runs capped ([[adjacentLcp]]'s
    * `maxLcp` machinery) and the region arithmetic is still exact —
    * only per-SPAN lengths beyond the cap would be understated, and
    * the output reports merged regions, not raw span lengths.
    *
    * Touching intervals merge ([p,5) ∪ [5,e) is one region): a region
    * boundary means a genuinely non-duplicated character between.
    *
    * The ranking itself is TRUNCATED at 2·cap characters (`build`'s
    * `maxPrefix`), cutting the doubling ladder to ~log₂ cap rounds and
    * ONE densify regardless of document length. Per-position dup
    * lengths are unchanged: equal-truncated-rank groups are contiguous
    * runs of the full suffix order, so (a) a position whose truncated
    * rank has ≥ 2 members shares ≥ min(2·cap, its remaining length) ≥
    * min(cap, remaining) characters with another position — the
    * multiplicity branch yields min(remaining, cap), exactly the full
    * ranking's value (capped LCP ≥ cap collapses there too); (b) a
    * singleton truncated rank IS a full rank, its truncated-order
    * neighbors are its full-order neighbor runs, every member of a run
    * shares the run's padded 2·cap-prefix, so the capped LCP against
    * the run's representative equals the capped LCP against the
    * full-order-adjacent member — and two DIFFERENT truncated ranks
    * always have LCP ≤ 2·cap − 1, within what the walked levels
    * (1 … cap, summing to 2·cap − 1) measure exactly up to the cap.
    *
    * Scale shape: one suffix-index build (keepLevels = false — no walk
    * levels), ONE per-rank aggregate pass (pair representative +
    * multiplicity together, checkpointed once for both consumers), the
    * capped LCP by DIRECT slice comparison (adjacent-rank representative
    * pairs join their cap-char substrings and run one codegen'd
    * character compare — exact because the consumed value is clamped at
    * the cap anyway, so the unbounded-LCP walk machinery is pure
    * overhead here), then one rank-keyed equi-join (pre-merged per-rank
    * lcp/multiplicity onto positions) and doc-partitioned windows for
    * the interval merge — no all-pairs, nothing beyond the index
    * build's own cost class.
    */
  def dupSpans(
      docs: DataFrame,
      id: String,
      text: String,
      minSpan: Long,
      cap: Long = 64L,
      buckets: Int = 512): DataFrame = {
    val (spans, free) = dupSpanIntervals(docs, id, text, minSpan, cap, buckets)
    val perDoc = spans.groupBy(col("did"))
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("e") - col("s")).as("dup_chars"))
    val out = docs.filter(length(col(text)) >= 1)
      .select(col(id).as("did"), length(col(text)).cast("long").as("n_chars"))
      .join(perDoc, Seq("did"), "left")
      .select(col("did").as(id), col("n_chars"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
    // materialize the ONE-ROW-PER-DOC result eagerly, then free the
    // O(total chars) suffix-index checkpoints (see dupSpanIntervals) —
    // what stays resident is the per-doc snapshot the caller consumes
    // (the suffixRanks one-returned-snapshot contract, doc-count-sized).
    val h = localCheckpointHandle(out)
    free()
    h._1
  }

  /** The transformation [[dupSpans]] accounts for: rebuild each document
    * with its merged duplicated regions REMOVED (Lee et al. ACL'22 §4's
    * removal step — the catalog's `q_span_scrub` is the chunk-granular
    * keep-first variant; this is the exact character-granular suffix-index
    * one). Removes EVERY copy of a duplicated span — the conservative
    * decontamination variant; keep-first semantics compose by exempting
    * the global first occurrence before interval merge.
    *
    * One row per non-empty document:
    * (id, n_chars, kept_chars, `scrubbedCol`) — the text with every
    * character inside a merged ≥ `minSpan` duplicated region deleted
    * (the complement substrings concatenated in order).
    *
    * Scale shape: everything [[dupSpans]] costs (one suffix-index build +
    * direct-compare capped LCP + interval merge), then ONE per-doc interval
    * `collect_list` (bounded by len/minSpan intervals per doc — the merge
    * guarantees a non-duplicated character between consecutive spans)
    * joined back to the docs and folded map-side into the kept string —
    * no per-character shuffle, no window over raw text.
    */
  def scrubDupSpans(
      docs: DataFrame,
      id: String,
      text: String,
      minSpan: Long,
      cap: Long = 64L,
      buckets: Int = 512,
      scrubbedCol: String = "text_scrubbed"): DataFrame = {
    val (spans, free) = dupSpanIntervals(docs, id, text, minSpan, cap, buckets)
    val iv = spans.groupBy(col("did"))
      .agg(sort_array(collect_list(struct(
        col("s").cast("long").as("s"), col("e").cast("long").as("e"))))
        .as("ivs"))
    // fold the sorted disjoint intervals into the kept string: cursor c
    // starts at 1; each interval appends text[c, s) and advances c to e;
    // the finisher appends the tail text[c, len]. substr with a zero
    // length (touching intervals at the ends) yields "".
    val rebuilt = aggregate(
      col("ivs"),
      struct(lit(1L).as("c"), lit("").as("acc")),
      (st, x) => struct(
        x.getField("e").as("c"),
        concat(st.getField("acc"),
          col("_t").substr(st.getField("c").cast("int"),
            (x.getField("s") - st.getField("c")).cast("int"))).as("acc")),
      st => concat(st.getField("acc"),
        col("_t").substr(st.getField("c").cast("int"),
          (col("n_chars") - st.getField("c") + lit(1L)).cast("int"))))
    val out = docs.filter(length(col(text)) >= 1)
      .select(col(id).as("did"), col(text).as("_t"),
        length(col(text)).cast("long").as("n_chars"))
      .join(iv, Seq("did"), "left")
      .select(col("did").as(id), col("n_chars"),
        when(col("ivs").isNull, col("_t")).otherwise(rebuilt).as(scrubbedCol))
      .select(col(id), col("n_chars"),
        length(col(scrubbedCol)).cast("long").as("kept_chars"),
        col(scrubbedCol))
    // same eager-materialize-then-free discipline as dupSpans; the
    // resident snapshot is doc-count rows of scrubbed text
    val h = localCheckpointHandle(out)
    free()
    h._1
  }

  /** Merged duplicated-span intervals per document — the shared core of
    * [[dupSpans]] (accounting) and [[scrubDupSpans]] (transformation).
    * Returns the LAZY (did, s, e) interval table (s 1-based inclusive, e
    * exclusive; intervals disjoint and maximal within a doc) plus a free
    * callback releasing the O(total chars) suffix-index checkpoints —
    * the caller MUST eagerly materialize its consumption of the interval
    * table (its own local checkpoint) before invoking the callback.
    */
  private def dupSpanIntervals(
      docs: DataFrame,
      id: String,
      text: String,
      minSpan: Long,
      cap: Long,
      buckets: Int): (DataFrame, () => Unit) = {
    require(minSpan >= 1, s"minSpan must be >= 1, got $minSpan")
    require(cap >= minSpan, s"cap ($cap) must be >= minSpan ($minSpan) — " +
      "the capped union argument needs a length-minSpan interval to fit " +
      "inside the cap")
    require(cap <= Int.MaxValue / 2, s"cap ($cap) overflows the 2*cap rank horizon")
    // no kept levels: the span arithmetic only consumes LCPs CLAMPED at
    // the cap, and a cap-clamped LCP is computable by DIRECT character
    // comparison of the two cap-char suffix slices (one codegen'd pass)
    // — the log₂(cap)-round LCP walk, its per-level pair-state shuffles,
    // its kept-level carries through the densify, and the 1-gram level
    // all exist to serve UNBOUNDED LCP ([[adjacentLcp]]'s contract) and
    // are skipped here entirely (measured sf0.1 full-table: 17 → 11 s).
    val levels = build(docs, id, text, buckets, keepLevels = false,
      maxPrefix = 2 * cap)
    val sr = levels.last.df // (did, pos, r) — checkpoint freed below
    // ONE aggregate pass over the rank table serves both consumers —
    // the pair representatives and the per-rank multiplicity the span
    // arithmetic needs — checkpointed so neither recomputes it.
    val (rstats, rstatsRdd) = localCheckpointHandle(
      sr.groupBy(col("r"))
        .agg(min(struct(col("did"), col("pos"))).as("m"),
          count(lit(1)).as("cnt")))
    val reps = rstats
      .select(col("r"), col("m.did").as("did"), col("m.pos").as("pos"))
    // adjacent-rank representative pairs fetch their cap-char slices and
    // compare once. Equivalence to least(walk_lcp, cap): true LCP < cap
    // is measured exactly by both; true LCP ≥ cap saturates both the
    // walk (clamped) and the slice compare (slices are cap chars).
    // Checkpointed because the span arithmetic joins it TWICE (lu/ld).
    val slices = docs.filter(length(col(text)) >= 1)
      .select(col(id).as("did"), col(text).as("_txt"))
    val capLen = lit(cap.toInt)
    val (lcpByRank, lcpRdd) = localCheckpointHandle(
      reps.select(col("r").as("srank"), col("did").as("da"), col("pos").as("pa"))
        .join(reps.select((col("r") - 1).as("srank"),
          col("did").as("db"), col("pos").as("pb")), Seq("srank"))
        .join(slices.select(col("did").as("da"), col("_txt").as("_ta")), Seq("da"))
        .select(col("srank"), col("db"), col("pb"),
          col("_ta").substr(col("pa").cast("int"), capLen).as("_sa"))
        .join(slices.select(col("did").as("db"), col("_txt").as("_tb")), Seq("db"))
        .select(col("srank"),
          graft.functions.expressions.NativeExpressions.commonPrefixChars(
            col("_sa"),
            col("_tb").substr(col("pb").cast("int"), capLen)).as("l")))
    // rank-keyed inputs (multiplicity + up/down LCP) pre-joined into ONE
    // rank-side table so the corpus-sized sr streams through a single
    // rank join, not three; the doc length comes from the docs table
    // (positions are 1..len) instead of a max-window over every position
    val rankSide = rstats.select(col("r"), col("cnt").as("m"))
      .join(lcpByRank.select(col("srank").as("r"), col("l").as("lu")),
        Seq("r"), "left")
      .join(lcpByRank.select((col("srank") + 1).as("r"), col("l").as("ld")),
        Seq("r"), "left")
    val docLens = docs.filter(length(col(text)) >= 1)
      .select(col(id).as("did"), length(col(text)).cast("long").as("len"))
    val per = sr
      .join(rankSide, Seq("r"))
      .join(docLens, Seq("did"))
      .select(col("did"), col("pos"),
        greatest(
          when(col("m") >= 2,
            least(col("len") - col("pos") + 1, lit(cap))).otherwise(lit(0L)),
          coalesce(col("lu"), lit(0L)),
          coalesce(col("ld"), lit(0L))).as("dlen"))
    val ordered = Window.partitionBy(col("did")).orderBy(col("pos"))
    val spans = per.filter(col("dlen") >= minSpan)
      .select(col("did"), col("pos"), (col("pos") + col("dlen")).as("e"))
      .withColumn("pe",
        max(col("e")).over(ordered.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ng",
        when(col("pe").isNull || col("pos") > col("pe"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("ng")).over(ordered))
      .groupBy(col("did"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("e")).as("e2"))
      .select(col("did"), col("s"), col("e2").as("e"))
    val free = () => {
      levels.last.rdd.unpersist(blocking = false)
      rstatsRdd.unpersist(blocking = false)
      lcpRdd.unpersist(blocking = false)
      ()
    }
    (spans, free)
  }
}
