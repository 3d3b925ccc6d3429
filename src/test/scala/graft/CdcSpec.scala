package graft

import org.apache.spark.sql.functions.{col, concat_ws, explode, length, md5}
import org.apache.spark.sql.{functions => F}
import graft.functions.Dedup

/** Specs for content-defined chunking (Dedup.cdcChunks /
  * cdcDedupStats): losslessness, the shift-robustness property that
  * motivates CDC over fixed spans, and stats parity with an independent
  * scalar reimplementation of the rolling hash.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Independent scalar CDC: the sequential Gear form (h = 2h + g
    * masked), NOT the sliding-window form the oracle uses — agreement
    * of all three is the cross-check.
    */
  private def scalarChunks(s: String, maskBits: Int = Dedup.CdcMaskBits): Seq[String] = {
    val mask = (1 << maskBits) - 1
    val out = Seq.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      sb.appendCodePoint(cp)
      h = ((h << 1) + (cp.toLong * 2654435761L) % 256L) & mask
      if (h == 0 || i >= s.length) { out += sb.toString; sb.setLength(0) }
    }
    out.result()
  }

  test("chunks concatenate back to exactly the original text (testdata corpus)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = Dedup.cdcChunks(docs, "text")
      .select(col("doc_id"), (concat_ws("", col("chunks")) =!= col("text")).as("differs"))
      .filter(col("differs")).count()
    bad shouldBe 0L
  }

  test("chunk boundaries match the scalar sequential Gear scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
    val got = Dedup.cdcChunks(docs, "text")
      .select(col("doc_id"), col("chunks"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    val expected = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> scalarChunks(r.getString(1))).toMap
    got shouldBe expected
  }

  test("content-defined: a head insertion re-aligns every chunk past its neighborhood") {
    val base = (1 to 60)
      .map(i => s"sentence number $i carries a few distinct words along")
      .mkString(" ")
    val shifted = "INSERTED-PREFIX " + base
    val a = scalarChunks(base)
    val b = scalarChunks(shifted)
    // all base chunks except (at most) the first few boundary-straddling
    // ones reappear identically in the shifted text — the property fixed
    // 20-token spans (q_span_scrub) structurally lack
    val common = a.toSet.intersect(b.toSet)
    assert(a.size >= 4, s"corpus too short to be meaningful: ${a.size} chunks")
    assert(common.size >= a.size - 2,
      s"expected all but ≤2 chunks to survive the shift; " +
        s"base=${a.size} common=${common.size}")
    // and the distributed path agrees on both variants
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(df, "text").select(col("doc_id"), col("chunks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got(1L) shouldBe a
    got(2L) shouldBe b
  }

  test("cdcDedupStats equals the scalar reference on a planted-dup corpus") {
    val corpus = Seq(
      (1L, "shared paragraph that appears in more than one document body here"),
      (2L, "shared paragraph that appears in more than one document body here"),
      (3L, "a different text entirely with its own chunk population inside"),
      (4L, ""))
    val allChunks = corpus.flatMap { case (_, t) => scalarChunks(t) }
    val byChunk = allChunks.groupBy(identity).map { case (c, xs) => c -> xs.size }
    val bytesTotal = allChunks.map(_.length.toLong).sum
    val bytesDistinct = byChunk.keys.map(_.length.toLong).sum

    val r = Dedup.cdcDedupStats(corpus.toDF("doc_id", "text"), "text")
      .collect().head
    r.getLong(0) shouldBe allChunks.size.toLong
    r.getLong(1) shouldBe byChunk.size.toLong
    r.getLong(2) shouldBe bytesTotal
    r.getLong(3) shouldBe bytesDistinct
    r.getLong(4) shouldBe (bytesTotal - bytesDistinct) * 10000 / bytesTotal
  }

  test("cdcIncremental: identical batch doc reports zero new bytes, edited doc only its neighborhood") {
    val base = (1 to 60)
      .map(i => s"sentence number $i carries a few distinct words along")
      .mkString(" ")
    val edited = base.replace("number 30", "number thirty")
    val corpus = Seq((1L, base), (2L, "some other corpus document text"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                       // byte-identical → nothing new
      (11L, edited),                     // near-dup → only the edit region new
      (12L, "a never seen before body")) // novel → everything new
      .toDF("doc_id", "text")
    val store = Dedup.cdcChunkTable(corpus, "doc_id", "text")
    val got = Dedup.cdcIncremental(batch, store, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    got(10L)._2 shouldBe 0L                    // n_new_chunks
    got(10L)._4 shouldBe 0L                    // new_bytes
    got(11L)._2 should be > 0L
    got(11L)._4 should be < (edited.length.toLong / 2) // edit stays local
    got(12L)._2 shouldBe got(12L)._1           // all chunks new
    got(12L)._4 shouldBe "a never seen before body".length.toLong
  }

  test("empty text yields an empty chunk array and is excluded from stats") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(df, "text")
      .select(F.size(col("chunks"))).collect().head.getInt(0)
    chunks shouldBe 0
  }
}
