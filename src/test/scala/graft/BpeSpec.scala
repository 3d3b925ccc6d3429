package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE trainer parity: the incremental pair-delta trainer must produce
  * the IDENTICAL merge sequence (pairs AND counts) to the naive
  * full-recount loop — including the cases where delta maintenance is
  * easy to get wrong (overlapping occurrences, counts that go to zero
  * and re-appear, argmax ties).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("delta trainer equals naive trainer on an overlap-heavy corpus") {
    // "aaaa" exercises greedy disjoint-span merging ([aa][aa]); the
    // mixed words exercise pairs whose counts change without vanishing
    val w = Bpe.wordTable(docs(
      "aaaa aaaa aaa ab", "abab abab banana banana banana",
      "low lower lowest low low", "aaaa ab banana"), "text")
    val naive = Bpe.trainNaive(w, 10)
    val delta = Bpe.trainDelta(w, 10)
    delta shouldBe naive
    naive should have size 10
  }

  test("delta trainer equals naive trainer through full vocabulary exhaustion") {
    // tiny corpus: both trainers must stop at the same round when no
    // pair remains, not just agree on a prefix
    val w = Bpe.wordTable(docs("ab ab ba"), "text")
    val naive = Bpe.trainNaive(w, 50)
    val delta = Bpe.trainDelta(w, 50)
    delta shouldBe naive
    naive.size should be < 50
  }

  test("delta trainer equals naive trainer on real testdata documents") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 60)
    val w = Bpe.wordTable(d, "text")
    Bpe.trainDelta(w, 6) shouldBe Bpe.trainNaive(w, 6)
  }
}
