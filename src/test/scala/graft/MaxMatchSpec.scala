package graft

import org.apache.spark.sql.functions._
import graft.functions.MaxMatch

/** Specs for the WordPiece-style greedy longest-match tokenizer
  * (functions/MaxMatch.scala): the distributed vocab induction + fold
  * walk against an independent scalar reimplementation, plus edge
  * shapes the fold must get right.
  */
class MaxMatchSpec extends SparkSpec {
  import spark.implicits._

  /** Independent scalar greedy longest-match: at each position take the
    * longest vocab piece (≤ maxLen) starting there; single chars are
    * always in the vocab so the walk never dead-ends.
    */
  private def greedyPieces(w: String, vocab: Set[String], maxLen: Int): Int = {
    var p = 0
    var n = 0
    while (p < w.length) {
      val bl = (math.min(maxLen, w.length - p) to 1 by -1)
        .find(l => vocab.contains(w.substring(p, p + l)))
        .getOrElse(1)
      p += bl
      n += 1
    }
    n
  }

  /** Scalar mirror of the vocab induction: single chars ∪ top-k n-grams
    * (2..maxLen) by frequency-weighted count desc, gram asc.
    */
  private def inducedVocab(
      words: Map[String, Long], k: Int, maxLen: Int): Set[String] = {
    val chars = words.keys.flatMap(_.map(_.toString)).toSet
    val grams = for {
      (w, f)  <- words.toSeq
      p       <- 0 until w.length
      l       <- 2 to math.min(maxLen, w.length - p)
    } yield (w.substring(p, p + l), f)
    val top = grams.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
      .toSeq.sortBy { case (g, c) => (-c, g) }.take(k).map(_._1)
    chars ++ top
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the catalog the cathedral"),
    (3L, "concatenate the cats"),
    (4L, "a ab abc abcd abcde"),
    (5L, "xyzzy xyz zyx"),
    (6L, "the the the cat cat mat"))

  test("tokenizeCounts matches the scalar greedy longest-match on every doc") {
    val docs = corpus.toDF("doc_id", "text")
    val got = MaxMatch.tokenizeCounts(docs, "doc_id", "text", k = 12, maxLen = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val words = corpus.flatMap(_._2.trim.split("\\s+"))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val vocab = inducedVocab(words, k = 12, maxLen = 4)
    val expected = corpus.map { case (id, text) =>
      val ts = text.trim.split("\\s+").toSeq
      id -> (ts.size.toLong, ts.map(greedyPieces(_, vocab, 4).toLong).sum)
    }.toMap

    got shouldBe expected
  }

  test("a word that IS a top gram tokenizes to one piece; unseen-gram words fall back to chars") {
    // "abab" repeated makes "abab"/"ab"/"ba"... frequent; "q" never pairs
    val docs = Seq((1L, "abab abab abab qq"), (2L, "abab")).toDF("doc_id", "text")
    val words  = MaxMatch.wordTable(docs, "text")
    val vocab  = MaxMatch.vocab(words, k = 3, maxLen = 4)
    val pieces = MaxMatch.wordPieceCounts(words, vocab, maxLen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pieces("abab") shouldBe 1L // the 4-gram itself wins the greedy match
    // "qq": gram "qq" has weight 1 — below the top-3 cut (abab/aba/bab
    // family dominates), so it splits into single chars
    pieces("qq") shouldBe 2L
  }

  test("vocab always contains every single character (no dead-ends, no [UNK] path)") {
    val docs  = Seq((1L, "zq xv jw")).toDF("doc_id", "text")
    val words = MaxMatch.wordTable(docs, "text")
    val v = MaxMatch.vocab(words, k = 0, maxLen = 4)
      .collect().map(_.getString(0)).toSet
    v should contain allOf ("z", "q", "x", "v", "j", "w")
    // k=0: no grams at all → every word is char-segmented
    val pieces = MaxMatch.wordPieceCounts(words, v.toSeq.toDF("gram"), maxLen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pieces shouldBe Map("zq" -> 2L, "xv" -> 2L, "jw" -> 2L)
  }

  test("fold walk is exact on the driver testdata corpus vs the scalar reference") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    val rows = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val words = rows.flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val vocab = inducedVocab(words, k = 200, maxLen = 4)

    val got = MaxMatch.tokenizeCounts(docs, "doc_id", "text", k = 200, maxLen = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.map { case (id, text) =>
      val ts = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      id -> (ts.size.toLong, ts.map(greedyPieces(_, vocab, 4).toLong).sum)
    }.filter(_._2._1 > 0).toMap

    got shouldBe expected
  }
}
