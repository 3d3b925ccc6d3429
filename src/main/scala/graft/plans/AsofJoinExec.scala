package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as first-class Catalyst surface: a logical
  * node ([[AsofJoinPlan]]), a planner strategy ([[AsofJoinStrategy]],
  * injected via `GraftExtensions`), and a physical operator
  * ([[AsofJoinExec]]) executing the canonical merge: both sides
  * hash-clustered on the key and sorted by (key, ts), then one forward
  * scan pairs each left row with the latest right row at-or-before it.
  *
  * This is the plan shape the composed window formulation
  * ([[graft.operators.AsofJoin.asofJoin]], reference-free extension —
  * SURVEY.md §2.E notes the reference has no joins at all) already
  * reaches — one shuffle of |L|+|R| plus a partition sort — but as a
  * dedicated operator: no union/tag columns, no window-function state,
  * each right row buffered at most once (O(1) memory beyond the sort),
  * and EnsureRequirements provides the exchanges/sorts, so AQE still
  * re-plans partition counts underneath it.
  *
  * Semantics (pinned by the A/B spec against the window formulation):
  * greatest right ts ≤ left ts per key, inclusive; right rows must be
  * unique per (key, ts) or "which equal row" is sort-order-dependent.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression)
    extends BinaryNode {

  // right side nullable: unmatched left rows carry an all-null right row
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(
        planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTs, p.rightKey, p.rightTs) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key; EnsureRequirements inserts the
  // exchanges (and keeps them compatible), AQE sizes them
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  // merge scan needs both sides sorted by (key, ts); EnsureRequirements
  // inserts the SortExecs
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Null-safe ordering over the key/ts types: nulls group first (so
    * null keys join null keys, matching the window formulation's
    * partitionBy semantics).
    */
  private def ordering(e: Expression): Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(e.dataType)
    (x: Any, y: Any) =>
      if (x == null && y == null) 0
      else if (x == null) -1
      else if (y == null) 1
      else base.compare(x, y)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB  = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB  = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = ordering(leftKey)
    val tsOrd  = ordering(leftTs)
    val rightWidth = right.output.size
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val toUnsafe = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      var pending: InternalRow = null // next right row, not yet consumed
      var candidate: InternalRow = null // latest right row ≤ current left
      var candidateKey: Any = null
      lIter.map { l =>
        val k = lKeyB.eval(l)
        val t = lTsB.eval(l)
        var scan = true
        while (scan && (pending != null || rIter.hasNext)) {
          if (pending == null) pending = rIter.next()
          val rk = rKeyB.eval(pending)
          val kc = keyOrd.compare(rk, k)
          if (kc < 0) pending = null // right key before left key: discard
          else if (kc == 0 && tsOrd.compare(rTsB.eval(pending), t) <= 0) {
            // rows from the sort iterator are reused buffers — copy the
            // row AND re-evaluate the key from the copy: `rk` itself may
            // be buffer-backed (UTF8String/binary) and clobbered by the
            // next rIter.next()
            candidate = pending.copy()
            candidateKey = rKeyB.eval(candidate)
            pending = null
          } else scan = false // right side is ahead of this left row
        }
        val matched =
          candidate != null && keyOrd.compare(candidateKey, k) == 0
        toUnsafe(joined(l, if (matched) candidate else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
