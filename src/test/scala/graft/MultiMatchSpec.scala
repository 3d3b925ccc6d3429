package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.{MultiMatch, NativeExpressions}

/** Aho–Corasick multi-pattern counter: parity with a naive scalar
  * matcher, the classic failure-link cases, overlap semantics, and the
  * guard rails.
  */
class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  /** Naive oracle: for each phrase, count every start position (the
    * overlapping-occurrences semantics the oracle SQL mirrors).
    */
  private def naive(text: String, phrases: Seq[String]): Seq[Long] =
    phrases.map { p =>
      var c = 0L
      var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
      c
    }

  private def run(texts: Seq[String], phrases: Seq[String]): Seq[Seq[Long]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), NativeExpressions.multiMatch(col("text"), phrases).as("c"))
      .orderBy("id")
      .collect().map(_.getSeq[Long](1)).toSeq

  test("classic failure-link case: ushers") {
    val phrases = Seq("he", "she", "his", "hers")
    run(Seq("ushers"), phrases).head shouldBe Seq(1L, 1L, 0L, 1L)
  }

  test("overlapping occurrences all count") {
    val phrases = Seq("aa", "aba")
    run(Seq("aaaa", "ababa"), phrases) shouldBe Seq(
      Seq(3L, 0L), // aa at 0,1,2
      Seq(0L, 2L)) // aba at 0,2 (overlapping)
  }

  test("matches a naive scalar matcher on random small-alphabet text") {
    val phrases = Seq("ab", "ba", "aab", "bba", "abab", "b")
    val rnd = new scala.util.Random(42)
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    run(texts, phrases) shouldBe texts.map(naive(_, phrases))
  }

  test("nested and prefix phrases count independently") {
    val phrases = Seq("a", "ab", "abc", "bc", "c")
    val text = "abcabc"
    run(Seq(text), phrases).head shouldBe naive(text, phrases)
  }

  test("empty text yields all-zero counts; null text yields null") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"),
        NativeExpressions.multiMatch(col("text"), Seq("x", "yz")).as("c"))
      .orderBy("id").collect()
    df(0).getSeq[Long](1) shouldBe Seq(0L, 0L)
    df(1).isNullAt(1) shouldBe true
  }

  test("guard rails: empty list, empty phrase, duplicates all reject") {
    import org.apache.spark.sql.graftbridge.GraftBridge
    val x = GraftBridge.expression(lit("x"))
    an[IllegalArgumentException] should be thrownBy MultiMatch(x, Seq.empty)
    an[IllegalArgumentException] should be thrownBy MultiMatch(x, Seq("a", ""))
    an[IllegalArgumentException] should be thrownBy MultiMatch(x, Seq("a", "a"))
  }
}
