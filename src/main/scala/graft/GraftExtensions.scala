package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{DotProduct, SimHash}

/** `SparkSessionExtensions` installer exposing the engine's native
  * Catalyst expressions to SQL:
  *
  *   SparkSession.builder.withExtensions(new GraftExtensions) ...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  *   SELECT graft_dot(a, b), graft_simhash(tokens) FROM t
  *
  * so pure-SQL users (and thriftserver/connect sessions) get the same
  * codegen'd hot paths the Scala API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule())
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash(tokenArray)")
        SimHash(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.Shingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingles(tokenArray, n)")
        graft.functions.expressions.Shingles(
          args(0), intLit(args(1), "graft_shingles n"), distinct = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_simhash"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.ShingleSimHash].getName,
        "graft_shingle_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_shingle_simhash(tokenArray)")
        graft.functions.expressions.ShingleSimHash(args(0), n = 3, bits = 64)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.RollingFp].getName, "graft_rolling_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_rolling_fp(tokenArray, windowSize)")
        graft.functions.expressions.RollingFp(
          args(0), intLit(args(1), "graft_rolling_fp windowSize"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.MinHashSig].getName,
        "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_sig(tokenArray, numHashes)")
        graft.functions.expressions.MinHashSig(
          args(0), intLit(args(1), "graft_minhash_sig numHashes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc(str)")
        graft.functions.expressions.NfcNormalize(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_fp"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.WinnowFp].getName, "graft_winnow_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_winnow_fp(tokenArray, k, w)")
        graft.functions.expressions.WinnowFp(
          args(0),
          intLit(args(1), "graft_winnow_fp k"),
          intLit(args(2), "graft_winnow_fp w"))
      }))
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }
}
