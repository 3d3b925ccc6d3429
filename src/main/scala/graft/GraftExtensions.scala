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
  }
}
