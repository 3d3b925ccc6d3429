package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL surface of the native expressions via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite with Matchers {

  test("graft_dot / graft_simhash are callable from SQL via GraftExtensions") {
    TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }
}
