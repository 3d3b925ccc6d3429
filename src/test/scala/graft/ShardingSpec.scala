package graft

import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** Specs for the loader shard manifest: auto-sizing rule, balance,
  * manifest invariants, and explicit-vs-auto equivalence.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("autoShardCount: ceil(rows / rowsPerShard), minimum 1") {
    Sharding.autoShardCount(0L, 1000L) shouldBe 1
    Sharding.autoShardCount(1L, 1000L) shouldBe 1
    Sharding.autoShardCount(1000L, 1000L) shouldBe 1
    Sharding.autoShardCount(1001L, 1000L) shouldBe 2
    Sharding.autoShardCount(10000L, 1000L) shouldBe 10
    // the 100 TB sanity row from the scaladoc: ~25B docs → ~6k shards
    Sharding.autoShardCount(25L * 1000 * 1000 * 1000) shouldBe 5961
    intercept[IllegalArgumentException](Sharding.autoShardCount(5L, 0L))
  }

  test("auto-sized manifest: no shard exceeds the rows-per-shard target beyond hash jitter") {
    // 10k docs at a 1k-row target → 10 shards; md5 balance keeps every
    // shard within ~15% of the target, so the parallelism-=-shards
    // contract (each task sorts ~rowsPerShard rows) holds
    val docs = spark.range(10000).select(col("id").as("doc_id"))
    val m = Sharding.shardManifest(docs, "doc_id", numShards = 0,
      epoch = 0, rowsPerShard = 1000L)
    val sizes = m.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes.keySet shouldBe (0L until 10L).toSet
    all(sizes.values) should be <= 1150L
    all(sizes.values) should be >= 850L
  }

  test("manifest invariants: every doc exactly once, positions contiguous from 1 per shard") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    val m = Sharding.shardManifest(docs, "doc_id", numShards = 4).cache()
    m.count() shouldBe 500L
    m.select("doc_id").distinct().count() shouldBe 500L
    // per shard: pos is 1..size with no gaps
    val bad = m.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"))
      .filter(!(col("lo") === 1L && col("hi") === col("n") && col("nd") === col("n")))
    bad.count() shouldBe 0L
    m.unpersist()
  }

  test("explicit shard count equals auto-sizing when the counts coincide; epochs reshuffle") {
    val docs = spark.range(2000).select(col("id").as("doc_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val explicit = rows(Sharding.shardManifest(docs, "doc_id", numShards = 2))
    val auto     = rows(Sharding.shardManifest(docs, "doc_id", numShards = 0,
      rowsPerShard = 1000L))
    auto shouldBe explicit
    // a different epoch salt is an independent global shuffle
    val ep1 = rows(Sharding.shardManifest(docs, "doc_id", numShards = 2, epoch = 1))
    ep1 should not be explicit
    ep1.map(_._1) shouldBe explicit.map(_._1) // same docs, different slots
  }

  test("globalOrder equals the naive single-sort global rank, at any bucket width") {
    // the two-pass form (per-bucket rank + driver prefix-sum offsets)
    // must reproduce row_number() OVER (ORDER BY h, id) - 1 exactly:
    // buckets are hash PREFIXES, so bucket boundaries are global-order
    // boundaries and offset+local rank == global rank
    val docs = spark.range(3000).select(col("id").as("doc_id"))
    val naive = docs
      .select(col("doc_id"),
        md5(concat(lit("ep0:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("h"), col("doc_id"))).cast("long") - 1)
      .select("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (pc <- Seq(1, 2, 3)) {
      val fast = Sharding.globalOrder(docs, "doc_id", epoch = 0, prefixChars = pc)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"prefixChars=$pc: ") { fast shouldBe naive }
    }
  }

  test("globalOrder: dense 0..N-1 positions, epochs are independent permutations") {
    val docs = spark.range(1500).select(col("id").as("doc_id"))
    val ep0 = Sharding.globalOrder(docs, "doc_id", epoch = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ep0.map(_._2).sorted shouldBe (0L until 1500L).toArray
    val ep1 = Sharding.globalOrder(docs, "doc_id", epoch = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ep1.map(_._2).sorted shouldBe (0L until 1500L).toArray
    ep0.toSet should not be ep1.toSet
  }

  test("chunkWindows: coverage, overlap, short tail, empty docs") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens
      (2L, "x y"),           // fits one chunk
      (3L, "  "),            // empty after trim -> no chunks
      (4L, "p q r s")        // exactly chunkSize
    ).toDF("doc_id", "text")
    val got = Sharding.chunkWindows(docs, "doc_id", "text",
      chunkSize = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1: chunks = 1 + ceil((7-4)/2) = 3 at starts 1, 3, 5
    got((1L, 0L)) shouldBe ((1L, 4L, "a b c d"))
    got((1L, 1L)) shouldBe ((3L, 4L, "c d e f"))
    got((1L, 2L)) shouldBe ((5L, 3L, "e f g")) // short tail kept
    got((2L, 0L)) shouldBe ((1L, 2L, "x y"))
    got((4L, 0L)) shouldBe ((1L, 4L, "p q r s"))
    got.keys.count(_._1 == 1L) shouldBe 3
    got.keys.count(_._1 == 2L) shouldBe 1
    got.keys.exists(_._1 == 3L) shouldBe false // empty doc: no chunks
    got.keys.count(_._1 == 4L) shouldBe 1      // n == chunkSize: one chunk
    // every token covered: union of [start, start+n) spans 1..7
    val covered = got.collect { case ((1L, _), (st, n, _)) =>
      (st until st + n) }.flatten.toSet
    covered shouldBe (1L to 7L).toSet
  }

  test("chunkWindows is partition-layout invariant and shuffle-free") {
    val docs = (0 until 200)
      .map(i => (i.toLong, (0 to i % 9).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Sharding.chunkWindows(docs, "doc_id", "text", 3, 2)
      .collect().map(_.toSeq).toSet
    val b = Sharding.chunkWindows(docs.repartition(7), "doc_id", "text", 3, 2)
      .collect().map(_.toSeq).toSet
    a shouldBe b
    // zero-shuffle contract: no Exchange anywhere in the plan
    val plan = Sharding.chunkWindows(docs, "doc_id", "text", 3, 2)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("lengthBatchReport: hand-computed golden on one shard") {
    // token counts by id order: 3, 1, 4, 1, 5; batchSize 2
    val docs = Seq(
      (0L, "s", "a a a"), (1L, "s", "b"), (2L, "s", "c c c c"),
      (3L, "s", "d"), (4L, "s", "e e e e e")).toDF("doc_id", "shard", "text")
    val got = Sharding.lengthBatchReport(docs, "doc_id", "text", "shard", 2)
      .collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    // arrival: {3,1}{4,1}{5} -> slots 6+8+5=19, padded 19-14=5, bp 2631
    got("arrival") shouldBe ((3L, 14L, 19L, 5L, 2631L))
    // length-sorted: {5,4}{3,1}{1} -> slots 10+6+1=17, padded 3, bp 1764
    got("length") shouldBe ((3L, 14L, 17L, 3L, 1764L))
  }

  test("lengthBatchReport property: with full batches, the length arm never wastes more than arrival") {
    val rnd = new scala.util.Random(31)
    // 2 shards x 64 docs (divisible by batchSize 8 -> every batch full,
    // where sorted contiguous grouping provably minimizes Σ batch maxima;
    // a short tail batch can locally favor either arm, so the catalog
    // query reports rather than asserts)
    val docs = (0 until 128).map { i =>
      val nt = 1 + rnd.nextInt(40)
      (i.toLong, s"sh${i % 2}", Seq.fill(nt)("w").mkString(" "))
    }.toDF("doc_id", "shard", "text")
    val rows = Sharding.lengthBatchReport(docs, "doc_id", "text", "shard", 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    Seq("sh0", "sh1").foreach { sh =>
      val (nbA, sumA, slotA, padA) = rows((sh, "arrival"))
      val (nbL, sumL, slotL, padL) = rows((sh, "length"))
      nbA shouldBe 8L
      nbL shouldBe 8L
      sumA shouldBe sumL            // same corpus either way
      padA shouldBe slotA - sumA    // padding is exactly slot minus real
      padL shouldBe slotL - sumL
      padL should be <= padA        // sorted batching can only help
    }
  }

  test("shardKey equals shardManifest's shard assignment (the manifest key without the position window)") {
    val docs = (0 until 500).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val viaKey = docs
      .select($"doc_id", Sharding.shardKey($"doc_id", 16, epoch = 2).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaManifest = Sharding.shardManifest(docs, "doc_id", numShards = 16, epoch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaKey shouldBe viaManifest
    // and the key is a pure projection: zero shuffles in its plan
    val plan = docs
      .select($"doc_id", Sharding.shardKey($"doc_id", 16).as("shard"))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("sharded length-batch report: window parallelism = shard-key cardinality (no per-label single-task sort)") {
    // the q_length_batch_sharded shape: the report's window partitions
    // on the 32-way loader hash shard, so no task ever sorts more than
    // ~corpus/32 rows — vs the lang-keyed catalog twin where one task
    // sorts an entire language
    val docs = (0 until 640).map { i =>
      (i.toLong, Seq.fill(1 + i % 7)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val keyed = docs.withColumn("loader_shard",
      Sharding.shardKey($"doc_id", 32))
    val rep = Sharding.lengthBatchReport(
      keyed, "doc_id", "text", "loader_shard", batchSize = 8)
    val shards = rep.select($"shard").distinct().collect().map(_.getLong(0))
    shards.length should be >= 16 // >=16-way window parallelism at 640 docs
    // hash balance: no shard holds more than 3x the mean (md5 jitter
    // bound at 20 docs/shard expectation)
    val sizes = keyed.groupBy($"loader_shard").count()
      .collect().map(_.getLong(1))
    sizes.max should be <= 60L
    // the report's rank windows partition on the shard key (each task
    // sorts one shard, never the corpus)
    rep.queryExecution.optimizedPlan.toString should include ("windowspecdefinition(shard")
  }
}
