package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-loader shard manifests: the layout step between a
  * curated corpus and distributed training (every doc gets a
  * deterministic (shard, pos) slot for one epoch).
  *
  * Reference scope: the reference engine stops at serving-collection
  * layout (its TTL/partitioning step, mongo-init/init-collections.js);
  * the shard manifest is the training-pipeline extension of the same
  * idea, SURVEY.md §2's LLM-pipeline appendix.
  *
  * Determinism: the epoch-salted `md5(doc id)` order IS the epoch's
  * global shuffle — no RNG state, any engine reproduces it. Shards are
  * hash-balanced by construction (md5 prefix mod shards); positions are
  * a per-shard `row_number` over the hash order.
  *
  * Scale contract — PARALLELISM EQUALS THE SHARD COUNT: the shard key
  * is computed map-side and the only shuffle is the per-shard position
  * window, so each task sorts |corpus| / shards rows. That is the same
  * work a loader-shard build costs by definition, but ONLY if the shard
  * count is sized to the corpus: in production shards = loader-worker
  * count (hundreds–thousands). A fixed small count at 100 TB would
  * funnel the whole corpus through that many sort tasks — so
  * [[shardManifest]] auto-sizes from a rows-per-shard target unless the
  * caller pins an explicit count, and the sizing rule is spec-pinned
  * (no shard may exceed the target by more than hash-balance jitter).
  */
object Sharding {

  /** Default rows-per-shard target for [[autoShardCount]]: 4M docs per
    * loader shard keeps a shard's manifest (3 longs/row) well under a
    * task's memory and its sort a few seconds, while 100 TB of ~4 KB
    * docs (~25B rows) auto-sizes to ~6k shards — loader-fleet scale.
    */
  val DefaultRowsPerShard: Long = 4L * 1024 * 1024

  /** Shard count sized so no shard holds more than ~rowsPerShard rows:
    * ⌈corpusRows / rowsPerShard⌉, minimum 1. Window parallelism equals
    * the returned count (see the object doc).
    */
  def autoShardCount(
      corpusRows: Long,
      rowsPerShard: Long = DefaultRowsPerShard): Int = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    math.min(Int.MaxValue.toLong,
      math.max(1L, (corpusRows + rowsPerShard - 1) / rowsPerShard)).toInt
  }

  /** The loader-manifest shard key as a standalone map-side column —
    * the SAME epoch-salted-md5 rule [[shardManifest]] assigns (spec-
    * pinned equal), for consumers that need a doc's loader shard
    * WITHOUT the manifest's per-shard position window (the padding-
    * waste report, shard-local joins, co-partitioned writes). Pure
    * projection: zero shuffles, zero joins — at 100 TB the key costs
    * one md5 per row, map-side, wherever the corpus already is.
    */
  def shardKey(
      id: org.apache.spark.sql.Column,
      numShards: Int,
      epoch: Int = 0): org.apache.spark.sql.Column = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    pmod(
      conv(substring(
        md5(concat(lit(s"ep$epoch:"), id.cast("string"))), 1, 15), 16, 10)
        .cast("long"),
      lit(numShards.toLong))
  }

  /** The per-epoch loader manifest: (id, shard, pos).
    *
    * `numShards > 0` pins the shard count (shards = loader workers, the
    * production call); `numShards = 0` auto-sizes via [[autoShardCount]]
    * from one narrow `count()` of the input (a row-count-only scan —
    * column pruning reads no data pages). `epoch` salts the hash so
    * each epoch is an independent global shuffle.
    */
  def shardManifest(
      docs: DataFrame,
      id: String,
      numShards: Int = 0,
      epoch: Int = 0,
      rowsPerShard: Long = DefaultRowsPerShard): DataFrame = {
    val shards =
      if (numShards > 0) numShards
      else autoShardCount(docs.count(), rowsPerShard)
    val h = md5(concat(lit(s"ep$epoch:"), col(id).cast("string")))
    docs
      .select(col(id), h.as("h"))
      .withColumn("shard",
        pmod(conv(substring(col("h"), 1, 15), 16, 10).cast("long"), lit(shards)))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("h"), col(id)))
          .cast("long"))
      .select(col(id), col("shard"), col("pos"))
  }

  /** GLOBAL contiguous epoch-shuffle positions without a global sort:
    * (id, pos) where pos is the row's rank 0‥N−1 in salted-md5 order —
    * the single-sequence training order (one data loader walking one
    * shuffled stream), where [[shardManifest]] gives the per-worker
    * sharded form.
    *
    * A naive `row_number() OVER (ORDER BY h)` funnels the whole corpus
    * through ONE sort task. Instead the hash's leading `prefixChars`
    * hex chars are the bucket — a PREFIX of the ordering key, so bucket
    * boundaries are exact global-order boundaries — and the position is
    * assigned in two passes:
    *  1. per-bucket row counts, collapsed map-side to ≤ 16^prefixChars
    *     rows, collected and prefix-summed driver-side into bucket
    *     start offsets;
    *  2. per-bucket rank window (each task sorts |corpus| /
    *     16^prefixChars rows) + the broadcast offset join.
    * At 100 TB with the default 3 hex chars (4096 buckets) each sort
    * task handles ~6M of ~25B rows; md5 uniformity keeps buckets within
    * hash-balance jitter of each other. No RNG state anywhere — any
    * engine reproduces the epoch's permutation from (id, epoch) alone.
    */
  def globalOrder(
      docs: DataFrame,
      id: String,
      epoch: Int = 0,
      prefixChars: Int = 3): DataFrame = {
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars must be in [1, 8], got $prefixChars")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = docs.sparkSession
    val h = md5(concat(lit(s"ep$epoch:"), col(id).cast("string")))
    val hashed = docs.select(col(id), h.as("h"))
      .withColumn("bucket",
        conv(substring(col("h"), 1, prefixChars), 16, 10).cast("int"))
    val counts = hashed.groupBy("bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = counts.map { case (b, n) => val o = acc; acc += n; Row(b, o) }
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*),
      StructType(Seq(StructField("bucket", IntegerType),
        StructField("off", LongType))))
    hashed
      .join(broadcast(offDf), Seq("bucket"))
      .withColumn("pos",
        col("off") + row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("h"), col(id)))
          .cast("long") - 1)
      .select(col(id), col("pos"))
  }

  /** Overlapping token-window chunks — the sequence-preparation step
    * between a curated corpus and a context-bounded consumer (RAG
    * passage stores, fixed-context pretraining examples, long-doc
    * embedding): each document becomes `1 + ⌈max(n−chunkSize,0) /
    * stride⌉` windows of up to `chunkSize` whitespace tokens starting
    * every `stride` tokens, so every token is covered, consecutive
    * chunks overlap by `chunkSize − stride`, and the trailing chunk may
    * run short rather than be dropped. Chunk ids are deterministic
    * (doc-local ordinals) so re-runs and incremental rebuilds assign
    * identical ids. Empty documents produce no chunks.
    *
    * Output: (id, chunk_id, chunk_start, n_tokens, chunk) with
    * `chunk_start` the 1-based token position of the window and `chunk`
    * the re-joined window text.
    *
    * Scale shape: a pure map-side generator — tokenize, explode the
    * per-doc chunk-index sequence, slice the token array. ZERO
    * shuffles at any corpus size; output volume is the input token
    * volume × (chunkSize / stride) overlap factor, which the caller
    * dials explicitly.
    */
  /** Length-grouped batching padding-waste report — the training-
    * efficiency measurement behind "sort by length before batching"
    * (dynamic batching / bucketed batching in every seq2seq and LLM
    * fine-tuning loader): when fixed-size batches are padded to their
    * longest member, arrival-order batching wastes compute on pad
    * tokens that length-sorted batching avoids. Two arms over the same
    * corpus, one row per (shard, arm):
    *
    *  - `arrival` — docs batched `batchSize` at a time in id order
    *  - `length`  — docs batched after sorting by (token count desc, id)
    *
    * with `slot_tokens` = Σ batch_rows·batch_max (compute actually
    * spent), `padded_tokens` = slot − real tokens, and `waste_bp` the
    * padded share in basis points — exact integer arithmetic, floor
    * division, hash-comparable cross-engine.
    *
    * With every batch full (shard size divisible by batchSize), sorted
    * contiguous grouping provably minimizes Σ batch maxima, so the
    * length arm's waste is a lower bound the arrival arm can only meet
    * (spec-pinned); a short trailing batch can locally favor either arm.
    *
    * Scale shape: one narrow (shard, id, n_tokens) projection; each arm
    * is a per-shard rank window + two keyed aggregations — text never
    * shuffles. Window parallelism = shard count, so production calls
    * pass the loader-shard key ([[shardManifest]]'s output, or
    * (domain, shard)) rather than a low-cardinality label; the catalog
    * query uses the language column as the shard for oracle literalness.
    */
  def lengthBatchReport(
      docs: DataFrame,
      id: String,
      text: String,
      shardCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = docs.select(
      col(shardCol).as("shard"), col(id).as("_id"),
      graft.functions.TextFunctions.tokenCount(col(text)).cast("long").as("nt"))
    def arm(name: String, order: Seq[org.apache.spark.sql.Column]) =
      base
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("shard")).orderBy(order: _*)))
        .withColumn("batch", expr(s"(rn - 1) DIV $batchSize"))
        .groupBy(col("shard"), col("batch"))
        .agg(count(lit(1)).as("bn"), max(col("nt")).as("mx"), sum(col("nt")).as("st"))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_batches"),
          sum(col("st")).as("sum_tokens"),
          sum(col("bn") * col("mx")).as("slot_tokens"),
          sum(col("bn") * col("mx") - col("st")).as("padded_tokens"))
        .withColumn("arm", lit(name))
    arm("arrival", Seq(col("_id")))
      .unionByName(arm("length", Seq(col("nt").desc, col("_id"))))
      .withColumn("waste_bp", expr(
        "CASE WHEN slot_tokens > 0 THEN (padded_tokens * 10000) DIV slot_tokens ELSE 0 END"))
      .select(col("shard"), col("arm"), col("n_batches"), col("sum_tokens"),
        col("slot_tokens"), col("padded_tokens"), col("waste_bp"))
  }

  def chunkWindows(
      docs: DataFrame,
      id: String,
      text: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride (chunkSize $chunkSize)")
    docs
      .select(col(id),
        graft.functions.TextFunctions.tokens(col(text)).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col(id), col("_toks"),
        explode(sequence(lit(0L),
          expr(s"(greatest(size(_toks) - $chunkSize, 0) + ${stride - 1}) " +
            s"DIV $stride").cast("long"))).as("chunk_id"))
      .select(col(id), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("chunk_start"),
        slice(col("_toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)).as("_win"))
      .select(col(id), col("chunk_id"), col("chunk_start"),
        size(col("_win")).cast("long").as("n_tokens"),
        concat_ws(" ", col("_win")).as("chunk"))
  }
}
