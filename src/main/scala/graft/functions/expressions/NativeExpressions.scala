package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the per-row hot paths where Spark's
  * built-in higher-order functions (`zip_with`/`aggregate`/`transform`)
  * fall out of whole-stage codegen into interpreted lambda evaluation.
  *
  * Both expressions preserve the exact arithmetic of the column-algebra
  * versions they replace (sequential left-to-right summation), so DuckDB
  * oracle hashes are unchanged — they are drop-in performance upgrades,
  * not semantic changes.
  */
object NativeExpressions {

  /** Codegen'd sequential-fold dot product of two array<double> columns.
    * Same summation order as `aggregate(zip_with(a, b, _*_), 0.0, _+_)`.
    */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** 32-bit SimHash of an array<string> token column; replaces a 32-way
    * interpreted bit-vote with one pass over the tokens per row.
    */
  def simhash(tokens: Column): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(tokens)))

  /** Misra-Gries heavy-hitters aggregate over a string column: at most
    * `k` (item, cnt) counters, mergeable across partitions; exact when
    * the column has ≤ k distinct values (see [[HeavyHitters]]).
    */
  def heavyHitters(c: Column, k: Int): Column =
    GraftBridge.column(
      HeavyHitters(GraftBridge.expression(c), k).toAggregateExpression())
}

/** dot(a, b) = Σ a(i)·b(i), sequential order, over array<double>.
  * Whole-stage-codegen'd: the generated code is a primitive loop over the
  * two `ArrayData` backing arrays — no per-element boxing, no lambda
  * dispatch. Arrays are assumed element-non-null (embeddings); lengths are
  * clamped to the shorter input like `zip_with`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are pre-cast to array<double> by the caller (Similarity.toDouble)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** 32-bit SimHash over an array<string> of tokens.
  *
  * Bit j is set iff Σ over tokens of (+1 if bit j of the token's md5 is
  * set else -1) is positive, where bit j lives in hex-nibble j/4
  * (0-indexed from the left of the 32-char md5 hex string), mask
  * 1<<(j%4) — byte-for-byte the same definition as the column-algebra
  * version and the DuckDB oracle.
  *
  * One md5 per token per row (the column-algebra version recomputed the
  * token hash array for each of the 32 bits).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  // input is an array<string> token column (TextFunctions.tokens)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](32)
    val md = SimHash.digest.get()
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        md.reset()
        val bytes = md.digest(arr.getUTF8String(t).getBytes)
        var j = 0
        while (j < 32) {
          // hex nibble j/4: even index → high nibble of byte (j/4)/2
          val k   = j / 4
          val b   = bytes(k / 2) & 0xff
          val nib = if (k % 2 == 0) b >>> 4 else b & 0xf
          if ((nib & (1 << (j % 4))) != 0) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var sh = 0L
    var j  = 0
    while (j < 32) {
      if (counts(j) > 0) sh |= (1L << j)
      j += 1
    }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("simhashExpr", this)
    val arr  = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${arr.code}
        |boolean ${ev.isNull} = ${arr.isNull};
        |long ${ev.value} = -1L;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $expr.compute(${arr.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
