package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL + optimizer surface installed by [[GraftExtensions]]. */
class ExtensionsSpec extends AnyFunSuite with Matchers {

  /** Run `body` with a session built with GraftExtensions (the shared
    * TestSpark session predates the extensions, so a separate session over
    * the same SparkContext is created and the defaults restored after).
    */
  private def withExtSession[A](body: SparkSession => A): A = {
    TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try body(s)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("graft_dot / graft_simhash are callable from SQL via GraftExtensions") {
    withExtSession { s =>
      val dot = s.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .collect().head.getDouble(0)
      dot shouldBe 32.0

      // equals the column-API SimHash on the same tokens
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val viaSql = s.sql(
        "SELECT graft_simhash(array('alpha', 'beta', 'gamma')) AS h")
        .collect().head.getLong(0)
      val viaApi = Seq("alpha beta gamma").toDF("text")
        .select(graft.functions.Dedup.simhashExpr(col("text")))
        .collect().head.getLong(0)
      viaSql shouldBe viaApi
    }
  }

  test("graft_shingles / graft_shingle_simhash / graft_rolling_fp callable from SQL") {
    withExtSession { s =>
      import org.apache.spark.sql.functions.col
      val sh = s.sql("SELECT graft_shingles(array('a','b','c','b','c'), 2) AS g")
        .collect().head.getSeq[String](0)
      sh shouldBe Seq("a b", "b c", "c b")
      val ssh = s.sql("SELECT graft_shingle_simhash(array('a','b','c','d')) AS h")
        .collect().head.getLong(0)
      import s.implicits._
      val sshApi = Seq("a b c d").toDF("text")
        .select(graft.functions.Dedup.shingleSimhash(col("text")))
        .collect().head.getLong(0)
      ssh shouldBe sshApi
      // rolling fp returns the (doc_fp, min_shingle_fp) struct
      val rf = s.sql("SELECT graft_rolling_fp(array('a','b','c','d'), 3) AS f")
        .collect().head.getStruct(0)
      rf.length shouldBe 2
      an[IllegalArgumentException] should be thrownBy
        s.sql("SELECT graft_shingles(array('a'), 'x')").collect()
    }
  }

  test("graft_minhash_sig / graft_nfc callable from SQL") {
    withExtSession { s =>
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val viaSql = s.sql(
        "SELECT graft_minhash_sig(array('alpha', 'beta', 'gamma'), 16) AS sig")
        .collect().head.getSeq[Long](0)
      val viaApi = Seq("alpha beta gamma").toDF("text")
        .select(graft.functions.Dedup.minhashSig(col("text"), 16))
        .collect().head.getSeq[Long](0)
      viaSql shouldBe viaApi
      // decomposed e + combining acute composes to é (U+00E9)
      val nfc = s.sql("SELECT graft_nfc('café') AS t")
        .collect().head.getString(0)
      nfc shouldBe "café"
      an[IllegalArgumentException] should be thrownBy
        s.sql("SELECT graft_minhash_sig(array('a'), 'x')").collect()
    }
  }

  test("graft_winnow_fp callable from SQL") {
    withExtSession { s =>
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val viaSql = s.sql(
        "SELECT graft_winnow_fp(array('a','b','c','d','e','f'), 3, 2) AS fp")
        .collect().head.getSeq[Long](0)
      val viaApi = Seq("a b c d e f").toDF("text")
        .select(graft.functions.expressions.NativeExpressions
          .winnowFp(graft.functions.TextFunctions.tokens(col("text")), 3, 2))
        .collect().head.getSeq[Long](0)
      viaSql shouldBe viaApi
      viaSql should not be empty
    }
  }

  test("RangeJoinRule: naive interval join plans as bucketed equi-join, same rows") {
    withExtSession { s =>
      import s.implicits._
      import org.apache.spark.sql.functions.col
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      val pts  = (0L until 300L).map(i => (i, ts(i * 41 % 5000))).toSeq
      val ivls = (0L until 40L).map(i => (i, i * 307 % 4500, i * 307 % 4500 + 120)).toSeq
      val points    = pts.toDF("pid", "ts")
      val intervals = ivls.map { case (id, a, b) => (id, ts(a), ts(b)) }.toDF("iid", "s", "e")

      val joined = points.join(
        intervals, col("ts") >= col("s") && col("ts") <= col("e"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
      plan should include("_graft_bucket")

      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (pid, pt) <- pts
        (iid, a, b) <- ivls
        sec = pt.getTime / 1000
        if sec >= a && sec <= b
      } yield (pid, iid)).toSet
      got shouldBe expected
      expected should not be empty

      // kill-switch: disabling the rule restores the naive plan
      s.conf.set("spark.graft.rangeJoin.enabled", "false")
      try {
        val naive = points.join(
          intervals, col("ts") >= col("s") && col("ts") <= col("e"))
        naive.queryExecution.executedPlan.toString should not include "_graft_bucket"
        naive.select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected
      } finally s.conf.set("spark.graft.rangeJoin.enabled", "true")
    }
  }

  test("q_range_join_auto shape: rule fires under filter + aggregate, no nested-loop join") {
    withExtSession { s =>
      import s.implicits._
      import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      // the catalog query's exact structure: filtered event slices, naive
      // BETWEEN join, then a grouped aggregate on top
      val events = ((0L until 200L).map(i => (i, "click", ts(i * 37 % 3000), i % 50)) ++
        (200L until 230L).map(i => (i, "signup", ts((i - 200) * 100), 0L)))
        .toDF("event_id", "event_type", "ts", "cents")
      val wins = events.filter(col("event_type") === "signup")
        .select(col("event_id").as("win_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 15 MINUTES")).as("w_end"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("ts"), col("cents"))
      val agg = clicks
        .join(wins, col("ts") >= col("w_start") && col("ts") <= col("w_end"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_clicks"), sum(col("cents")).as("sum_cents"))
      val plan = agg.queryExecution.executedPlan.toString
      plan should include("_graft_bucket")
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
      // and the rewritten aggregate equals the naive (rule-off) aggregate
      val got = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      s.conf.set("spark.graft.rangeJoin.enabled", "false")
      try {
        val exp = clicks
          .join(wins, col("ts") >= col("w_start") && col("ts") <= col("w_end"))
          .groupBy(col("win_id"))
          .agg(count(lit(1)).as("n_clicks"), sum(col("cents")).as("sum_cents"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        got shouldBe exp
        exp should not be empty
      } finally s.conf.set("spark.graft.rangeJoin.enabled", "true")
    }
  }
}
