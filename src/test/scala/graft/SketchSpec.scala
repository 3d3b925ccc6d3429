package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.{CountMin, MinHashFamily, NativeExpressions, WinnowFp}
import graft.functions.{TextFunctions => TF}

/** Count-Min sketch and winnowing fingerprint properties: exactness
  * regimes, one-sided error, merge determinism under repartitioning, and
  * the MOSS coverage guarantee.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: zipf-ish token draws
  private def corpus(nDocs: Int, vocab: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val toks = (0 until 20).map { j =>
        // quadratic skew: low token ids appear far more often
        val r = math.abs((i * 31L + j * 17L + 7L) * 2654435761L % 1000003L)
        s"w${(r % vocab) * (r % vocab) % vocab}"
      }
      (i.toLong, toks.mkString(" "))
    }

  private def toks(nDocs: Int, vocab: Int) =
    corpus(nDocs, vocab).toDF("doc_id", "text")
      .select(explode(TF.tokens(col("text"))).as("tok"))

  test("count-min is exact when width exceeds the distinct-key count") {
    val t = toks(200, 50).cache()
    val exact = t.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // width 512 >> 50 distinct keys and depth 4: a collision in EVERY
    // row is needed for an overcount; verify est == exact for all keys
    val sk = t.agg(NativeExpressions.countMin(col("tok"), 4, 512).as("cms"))
    val est = t.distinct().crossJoin(broadcast(sk))
      .withColumn("est", CountMin.estimate(col("cms"), col("tok"), 4, 512))
      .select("tok", "est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.keySet shouldBe exact.keySet
    est.foreach { case (k, e) => assert(e == exact(k), s"key $k") }
    t.unpersist()
  }

  test("count-min never undercounts, even at tiny width") {
    val t = toks(300, 400).cache()
    val exact = t.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // width 16 << 400 distinct keys: collisions everywhere — the
    // estimate must still be >= exact for every key (one-sided error)
    val sk = t.agg(NativeExpressions.countMin(col("tok"), 4, 16).as("cms"))
    val est = t.distinct().crossJoin(broadcast(sk))
      .withColumn("est", CountMin.estimate(col("cms"), col("tok"), 4, 16))
      .select("tok", "est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) =>
      assert(e >= exact(k), s"undercount for $k: $e < ${exact(k)}")
    }
    // and at least one real overcount at this width, or the test is vacuous
    assert(est.exists { case (k, e) => e > exact(k) })
    t.unpersist()
  }

  test("count-min counter matrix is identical under any partitioning") {
    val t = toks(200, 100)
    def matrix(parts: Int): Seq[Long] = t.repartition(parts)
      .agg(NativeExpressions.countMin(col("tok"), 4, 64).as("cms"))
      .collect()(0).getSeq[Long](0)
    val m1 = matrix(1)
    matrix(7) shouldBe m1
    matrix(32) shouldBe m1
  }

  test("count-min and winnowing reject mistyped inputs at analysis time") {
    // ExpectsInputTypes: a wrong-typed column must fail analysis with a
    // type error, not ClassCastException deep inside execution
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(NativeExpressions.countMin(col("id"), 2, 8)).collect()
    }
    e1.getMessage should include regex "(?i)type"
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(NativeExpressions.winnowFp(col("text"), 2, 4)).collect()
    }
    e2.getMessage should include regex "(?i)type"
  }

  test("winnowing selects at least one fingerprint per window and covers shared runs") {
    val k = 3
    val w = 4
    // two documents sharing a verbatim run of w+k-1 = 6 tokens — the
    // MOSS guarantee: they must share at least one selected fingerprint
    val shared = "alpha beta gamma delta epsilon zeta"
    val d1 = s"one two $shared three four five six seven"
    val d2 = s"nine ten eleven twelve $shared thirteen"
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      .select(col("doc_id"),
        NativeExpressions.winnowFp(TF.tokens(col("text")), k, w).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "documents sharing a w+k-1 token run must share a fingerprint")
  }

  test("winnowing density is near 2/(w+1) and never empty for docs with grams") {
    val k = 3
    val w = 8
    val docs = corpus(100, 5000).toDF("doc_id", "text")
    val stats = docs
      .select(col("doc_id"),
        (TF.tokenCount(col("text")) - (k - 1)).cast("long").as("n_grams"),
        NativeExpressions.winnowFp(TF.tokens(col("text")), k, w).as("fp"))
      .filter(col("n_grams") > 0)
      .select(col("n_grams"), expr("CAST(size(fp) AS BIGINT)").as("n_fp"))
      .collect()
    stats.foreach { r =>
      assert(r.getLong(1) >= 1, "every doc with a gram gets a fingerprint")
    }
    val density =
      stats.map(_.getLong(1)).sum.toDouble / stats.map(_.getLong(0)).sum
    // expected 2/(w+1) = 0.22; distinct-dedup pulls it below — accept a band
    assert(density > 0.05 && density < 0.5, s"density $density out of band")
  }

  test("winnowing matches an independent brute-force model") {
    val k = 2
    val w = 3
    // tiny reference implementation, written independently of the
    // expression's loop structure
    def model(text: String): Set[Long] = {
      val ts = text.trim.split("\\s+").toSeq
      if (ts.length < k) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 to ts.length - k).map { p =>
        val hex = md.digest(("g:" + ts.slice(p, p + k).mkString(" "))
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16) % (1L << 40)
      }
      val g = hs.length
      (0 to math.max(g - w, 0)).map { s =>
        val win = (s until math.min(s + w, g))
          .map(p => hs(p) * 1024L + (w - 1 - (p - s)))
        win.min / 1024L
      }.toSet
    }
    val texts = corpus(50, 200).map(_._2) ++ Seq("a b", "a", "", "x y z w v")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        NativeExpressions.winnowFp(TF.tokens(col("text")), k, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == model(t), s"doc $i: '$t'")
    }
  }

  test("winnowing fingerprints are sorted distinct ascending") {
    val fp = Seq((1L, corpus(1, 50).head._2)).toDF("doc_id", "text")
      .select(NativeExpressions.winnowFp(TF.tokens(col("text")), 3, 8).as("fp"))
      .collect()(0).getSeq[Long](0)
    fp shouldBe fp.distinct.sorted
  }

  test("count-min maintains incrementally over a stream: merged batches == one shot") {
    // the mergeability property IS incremental maintenance: per-batch
    // sketches element-wise-added into a running matrix equal the
    // one-shot sketch over everything — no reprocessing of history,
    // O(depth·width) state per trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val data = corpus(120, 80)
    val running = new Array[Long](4 * 64)
    val mem = MemoryStream[(Long, String)](spark)
    // enqueue BEFORE start: AvailableNow snapshots the offset boundary
    // when the stream thread initializes — data added after that races
    // the snapshot and would be silently skipped
    data.grouped(40).foreach(g => mem.addData(g))
    val query = mem.toDF().toDF("doc_id", "text")
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("cms-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val m = batch
          .agg(NativeExpressions.countMin(col("tok"), 4, 64).as("cms"))
          .collect()(0).getSeq[Long](0)
        var i = 0
        while (i < running.length) { running(i) += m(i); i += 1 }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(query.awaitTermination(60000), "streaming count-min query timed out")
    val oneShot = data.toDF("doc_id", "text")
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .agg(NativeExpressions.countMin(col("tok"), 4, 64).as("cms"))
      .collect()(0).getSeq[Long](0)
    running.toSeq shouldBe oneShot
  }

  test("span scrub keeps the first occurrence and rebuilds docs in order") {
    // doc 1 owns chunks A B; doc 2 repeats A then has C; doc 3 is A B
    // again entirely. 2-token chunks for readability.
    val a = "alpha one"; val b = "beta two"; val c = "gamma three"
    val docs = Seq(
      (1L, s"$a $b"),
      (2L, s"$a $c"),
      (3L, s"$a $b")).toDF("doc_id", "text")
    import org.apache.spark.sql.expressions.Window
    val chunks = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
      .withColumn("nch", expr("(size(tk) + 1) DIV 2"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, nch - 1), i -> concat_ws(' ', slice(tk, i * 2 + 1, 2)))")))
      .select(col("doc_id"), col("pos"), col("col").as("chunk"))
      .withColumn("h", md5(col("chunk")))
      .withColumn("packed", col("doc_id") * 1000000L + col("pos"))
      .withColumn("first_packed", min(col("packed")).over(Window.partitionBy(col("h"))))
    val kept = chunks.filter(col("packed") === col("first_packed"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("chunk")))).as("ks"))
      .select(col("doc_id"),
        expr("array_join(transform(ks, x -> x.chunk), ' ')").as("rebuilt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    kept(1L) shouldBe s"$a $b"          // owns both first occurrences
    kept(2L) shouldBe c                 // A scrubbed, C kept
    kept.get(3L) shouldBe None          // fully scrubbed: no kept chunks
  }

  test("count-min base hash matches the SQL chain's arithmetic") {
    // JVM byte-twiddling vs the documented formula:
    // CAST('0x'||substr(md5('c:'||x),1,15) AS BIGINT) % P
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq("alpha", "wörld", "日本語", "", "a b c").foreach { x =>
      val hex = md.digest(("c:" + x).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = java.lang.Long.parseLong(hex.take(15), 16) % MinHashFamily.P
      CountMin.baseHash(x) shouldBe want
    }
  }

  // --- HyperLogLog ---

  import graft.functions.expressions.HyperLogLog

  private def hllRegs(df: org.apache.spark.sql.DataFrame): Array[Int] =
    df.agg(NativeExpressions.hll(col("k"), 8).as("regs"))
      .collect().head.getSeq[Int](0).toArray

  /** Scalar model of the documented register semantics. */
  private def modelRegs(keys: Seq[String]): Array[Int] = {
    val regs = new Array[Int](256)
    keys.foreach { k =>
      val base = HyperLogLog.baseHash(k)
      val j = (base % 256).toInt
      val r = HyperLogLog.rankOf(base / 256, 52)
      if (r > regs(j)) regs(j) = r
    }
    regs
  }

  test("hll registers match the scalar model and ignore duplicates") {
    val keys = (0 until 800).map(i => s"key-$i")
    val withDups = (keys ++ keys ++ keys.take(100)).toDF("k")
    hllRegs(withDups) shouldBe modelRegs(keys)
  }

  test("hll registers are partition-invariant (mergeable by max)") {
    val df = (0 until 2000).map(i => s"v$i").toDF("k")
    val one = hllRegs(df.repartition(1))
    hllRegs(df.repartition(13)) shouldBe one
    hllRegs(df.repartition(32)) shouldBe one
  }

  test("hll of a union equals element-wise max of the parts") {
    val a = (0 until 900).map(i => s"a$i")
    val b = (500 until 1400).map(i => s"a$i") // overlaps a
    val union = hllRegs((a ++ b).distinct.toDF("k"))
    val merged = modelRegs(a).zip(modelRegs(b)).map { case (x, y) => math.max(x, y) }
    union shouldBe merged
  }

  test("hll raw estimate lands within 4 sigma in its regime") {
    // sigma = 1.04/sqrt(256) = 6.5%; raw regime needs n > 5m/2 = 640
    for (n <- Seq(1000, 5000, 20000)) {
      val df = (0 until n).map(i => s"item-$i-$n").toDF("k")
      val est = df.agg(NativeExpressions.hll(col("k"), 8).as("regs"))
        .withColumn("est", HyperLogLog.estimate("regs", 8))
        .select("est").collect().head.getLong(0)
      math.abs(est - n).toDouble / n should be < 0.26
    }
  }

  test("hll zero-register count matches the register array") {
    val df = (0 until 300).map(i => s"z$i").toDF("k")
    val row = df.agg(NativeExpressions.hll(col("k"), 8).as("regs"))
      .withColumn("v", HyperLogLog.zeroRegisters("regs"))
      .select("regs", "v").collect().head
    row.getLong(1) shouldBe row.getSeq[Int](0).count(_ == 0).toLong
  }
}
