package graft

import org.apache.spark.sql.functions._
import graft.functions.{MaxMatch, Unigram}

/** Unigram-LM Viterbi tokenizer: global optimality vs greedy
  * longest-match, the packed (surprisal, piece-count) tie-break, parity
  * with a scalar DP, and partition invariance.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-scored vocab: (gram, surprisal-bits) -> packed cost table. */
  private def vocabDf(entries: (String, Long)*) =
    entries.map { case (g, s) => (g, s * 1024L + 1L) }.toDF("gram", "cost")

  private def viterbi(words: Seq[String], vocab: Seq[(String, Long)], maxLen: Int) =
    Unigram.wordViterbi(
      words.map((_, 1L)).toDF("w", "f"), vocabDf(vocab: _*), maxLen)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("viterbi beats greedy longest-match where greedy strands itself") {
    // greedy on "abcde": grabs "abc", strands "de" -> d + e = 3 pieces;
    // optimal: ab + cde = 2 pieces
    val vocab = Seq("abc" -> 1L, "ab" -> 1L, "cde" -> 1L,
      "a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L, "e" -> 3L)
    val uni = viterbi(Seq("abcde"), vocab, 3)
    uni("abcde")._2 shouldBe 2L // ab + cde
    uni("abcde")._1 shouldBe 2L // 1 + 1 bits
    val greedy = MaxMatch.wordPieceCounts(
      Seq(("abcde", 1L)).toDF("w", "f"),
      vocab.map(_._1).toDF("gram"), 3)
      .collect().head.getLong(1)
    greedy shouldBe 3L
  }

  test("lower total surprisal wins over fewer pieces (LM semantics)") {
    // "ab" as one rare piece (5 bits) loses to two common pieces
    // (1 + 1 bits): packed min is 2*1024 + 2 < 5*1024 + 1
    val uni = viterbi(Seq("ab"),
      Seq("ab" -> 5L, "a" -> 1L, "b" -> 1L), 2)
    uni("ab") shouldBe ((2L, 2L))
    // flip the economics: the long piece is the cheap one
    val uni2 = viterbi(Seq("ab"),
      Seq("ab" -> 1L, "a" -> 3L, "b" -> 3L), 2)
    uni2("ab") shouldBe ((1L, 1L))
  }

  test("equal-surprisal segmentations resolve to fewest pieces") {
    // aa+a and a+aa and aaa all cost 2 or 3 bits: aaa (2 bits, 1 piece)
    // vs aa+a (1+1 bits, 2 pieces) — equal bits impossible here, so
    // craft exact tie: surp(aaa)=2, surp(aa)=1, surp(a)=1:
    //   aaa -> 2*1024+1 = 2049; aa+a -> 2*1024+2 = 2050 -> aaa wins
    val uni = viterbi(Seq("aaa"),
      Seq("aaa" -> 2L, "aa" -> 1L, "a" -> 1L), 3)
    uni("aaa") shouldBe ((2L, 1L))
  }

  /** Scalar reference DP over packed costs. */
  private def scalarDp(w: String, vocab: Map[String, Long], maxLen: Int): Long = {
    val n = w.length
    val best = new Array[Long](n + 2)
    for (p <- n to 1 by -1) {
      var m = Long.MaxValue
      for (len <- 1 to math.min(maxLen, n - p + 1)) {
        vocab.get(w.substring(p - 1, p - 1 + len)).foreach { c =>
          m = math.min(m, c + best(p + len))
        }
      }
      best(p) = m
    }
    best(1)
  }

  test("matches a scalar DP on random words over an induced vocab") {
    val rnd = new scala.util.Random(7)
    val words = (0 until 120).map { _ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.distinct
    val wf = words.map((_, 1L)).toDF("w", "f")
    val scored = Unigram.vocabScored(wf, 40, 4)
    val vocabMap = scored.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Unigram.wordViterbi(wf, scored, 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1) * 1024L + r.getLong(2))).toMap
    words.foreach { w =>
      withClue(s"word $w: ") { got(w) shouldBe scalarDp(w, vocabMap, 4) }
    }
  }

  test("result is partition-invariant") {
    val docs = (0 until 60).map(i => (i.toLong, s"ab abc${"c" * (i % 4)} b a"))
      .toDF("doc_id", "text")
    val a = Unigram.tokenizeCounts(docs.repartition(1), "doc_id", "text", 50, 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Unigram.tokenizeCounts(docs.repartition(17), "doc_id", "text", 50, 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    b shouldBe a
  }

  test("hard-EM refit never raises corpus cost and prunes unused pieces") {
    val docs = (0 until 80).map { i =>
      (i.toLong, Seq("abab", "abc", "cab", "ba")(i % 4) + " " +
        Seq("aa", "bb", "abba")(i % 3))
    }.toDF("doc_id", "text")
    val rows = Unigram.refitStats(docs, "text", 30, 4)
      .orderBy("round").collect()
    rows.length shouldBe 2
    val (r0, r1) = (rows(0), rows(1))
    // usage-fitted scores can only cheapen the corpus they were fit on
    r1.getLong(3) should be <= r0.getLong(3)   // corpus_bits
    // the seed carries never-used top-K grams; refit prunes them
    r1.getLong(1) should be < r0.getLong(1)    // model_pieces
    // pruning keeps every single char: round-1 model >= alphabet size
    val alphabet = docs.select(explode(split(regexp_replace(
      concat_ws("", col("text")), " ", ""), "")).as("c"))
      .filter(org.apache.spark.sql.functions.length(col("c")) > 0)
      .distinct().count()
    r1.getLong(1) should be >= alphabet
  }

  test("wordPieces reconstructs segmentations consistent with wordViterbi") {
    val rnd = new scala.util.Random(11)
    val words = (0 until 80).map { _ =>
      (0 until (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.distinct
    val wf = words.map((_, 1L)).toDF("w", "f")
    val scored = Unigram.vocabScored(wf, 30, 4)
    val counts = Unigram.wordViterbi(wf, scored, 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val pieces = Unigram.wordPieces(wf, scored, 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    words.foreach { w =>
      withClue(s"word $w: ") {
        pieces(w).mkString("") shouldBe w      // lossless
        pieces(w).size.toLong shouldBe counts(w) // same optimum
      }
    }
  }

  test("native expression matches the pure-plan reference form exactly") {
    // the plan form (explode + broadcast join + collect_list + fold) is
    // the semantic reference the DuckDB oracle mirrors; the shipped
    // UnigramViterbi expression must reproduce it row-for-row —
    // including the longest-optimum walk tie-break and the packed cost
    val rnd = new scala.util.Random(23)
    val words = (0 until 150).map { _ =>
      (0 until (1 + rnd.nextInt(14))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }.distinct
    val wf = words.map(w => (w, 1L + rnd.nextInt(9))).toDF("w", "f")
    val scored = Unigram.vocabScored(wf, 35, 4)
    def key(r: org.apache.spark.sql.Row) =
      r.getString(0) -> ((r.getLong(1), r.getSeq[String](2),
        r.getLong(3), r.getLong(4)))
    val native = Unigram.wordPieces(wf, scored, 4)
      .select(col("w"), col("f"), col("pieces"),
        col("surp_bits"), col("n_pieces")).collect().map(key).toMap
    val plan = Unigram.wordPiecesPlan(wf, scored, 4)
      .select(col("w"), col("f"), col("pieces"),
        col("surp_bits"), col("n_pieces")).collect().map(key).toMap
    native.keySet shouldBe plan.keySet
    words.foreach { w =>
      withClue(s"word $w: ") { native(w) shouldBe plan(w) }
    }
    val vNative = Unigram.wordViterbi(wf, scored, 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val vPlan = Unigram.wordViterbiPlan(wf, scored, 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    vNative shouldBe vPlan
  }

  test("token length guard rejects absurd words loudly") {
    val big = "x" * 1200
    val ex = intercept[Exception] {
      Unigram.wordViterbi(
        Seq((big, 1L)).toDF("w", "f"), vocabDf("x" -> 1L), 4).collect()
    }
    ex.getMessage should include("1024")
  }
}
