package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation (Kudo, ACL'18 §3; the SentencePiece
  * unigram tokenizer) of one word as ONE native expression: the whole
  * backward DP + forward walk runs inside the row against a scored
  * piece vocabulary built once per executor — no candidate-grid
  * explode, no broadcast join, no collect_list shuffle, no O(L²)
  * array-concat fold. This is the scalar-expression rung of the
  * catalog's custom-operator ladder (same pattern as [[MultiMatch]]:
  * `@transient lazy` model state referenced directly from generated
  * code, so the projection stays inside whole-stage codegen).
  *
  * Semantics are EXACTLY [[graft.functions.Unigram]]'s DataFrame fold
  * (spec-pinned A/B):
  *
  *   - packed costs: each vocab entry carries `surp·1024 + 1`, the DP
  *     minimizes the packed sum, so `best = surp_bits·1024 + n_pieces`
  *     with no carry while `n_pieces < 1024` — guaranteed by the same
  *     loud <1024 token-length guard as the plan form.
  *   - the backward DP at position p considers every vocab gram
  *     starting at p (a trie walk bounds the probe at the longest
  *     gram); candidates whose suffix state is unreachable are skipped
  *     (the `array_min`-skips-nulls rule of the fold); no usable
  *     candidate ⇒ p is unreachable; an unreachable word (possible
  *     only if the vocab misses one of its single chars) returns NULL,
  *     as the fold's null propagation does.
  *   - the forward walk emits, at each position, the LONGEST
  *     optimum-achieving candidate — the fold's `array_max` tie rule —
  *     so both forms reconstruct the identical segmentation.
  *
  * Character positions are Unicode codepoints, matching Spark's
  * `length`/`substring` semantics that the plan form (and the DuckDB
  * oracle) index with.
  *
  * Returns `struct<pieces: array<string>, surp_bits: bigint,
  * n_pieces: bigint>`.
  *
  * Scale shape (100 TB): the model is TRAINED state bounded by the
  * vocab-size parameter (top-k selection upstream), i.e. the
  * trained-index idiom — it rides the task closure to every executor
  * once; per row the DP is O(len · maxGramLen) trie steps with zero
  * shuffles, so corpus segmentation is a pure map over the distinct
  * word table.
  */
case class UnigramViterbi(child: Expression, vocab: Seq[(String, Long)])
  extends UnaryExpression {

  require(vocab.nonEmpty, "graft_unigram_viterbi needs a non-empty vocabulary")
  require(vocab.forall(_._1.nonEmpty),
    "empty grams can never segment — reject loudly")
  require(vocab.forall(_._2 >= 0L),
    "packed piece costs are non-negative by construction — reject loudly")
  require(vocab.map(_._1).distinct.size == vocab.size,
    "duplicate grams would make the DP ambiguous — reject loudly")

  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("surp_bits", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_unigram_viterbi requires a string column, got ${other.catalogString}")
    }

  @transient private lazy val trie = new UnigramViterbi.Trie(vocab)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Whole DP for one word; also the codegen entry point. Returns null
    * iff some position is unreachable under the vocab.
    */
  def compute(word: UTF8String): InternalRow = {
    val s = word.toString
    // codepoint array + the char offset of each codepoint (so pieces
    // slice the original string exactly where Spark's substring would)
    val n = s.codePointCount(0, s.length)
    if (n >= 1024)
      throw new IllegalArgumentException(
        s"unigram viterbi: token of length $n >= 1024 — packed " +
          "(surprisal, pieces) cost would overflow")
    val cps = new Array[Int](n)
    val off = new Array[Int](n + 1)
    var i = 0; var ci = 0
    while (i < n) {
      cps(i) = s.codePointAt(ci)
      off(i) = ci
      ci += Character.charCount(cps(i))
      i += 1
    }
    off(n) = ci
    // best(p): minimal packed cost of segmenting cps[p-1 ..], 1-based;
    // -1 = unreachable
    val best = new Array[Long](n + 2)
    best(n + 1) = 0L
    var p = n
    while (p >= 1) {
      var m = -1L
      var node = 0
      var len = 1
      var cont = true
      while (cont && len <= n - p + 1) {
        node = trie.step(node, cps(p + len - 2))
        if (node < 0) cont = false
        else {
          val c = trie.cost(node)
          if (c >= 0L) {
            val nb = best(p + len)
            if (nb >= 0L) {
              val v = c + nb
              if (m < 0L || v < m) m = v
            }
          }
          len += 1
        }
      }
      best(p) = m
      p -= 1
    }
    if (best(1) < 0L) return null
    // forward walk: longest optimum-achieving candidate at each step
    val pieces = mutable.ArrayBuffer.empty[UTF8String]
    p = 1
    while (p <= n) {
      val bp = best(p)
      var chosen = -1
      var node = 0
      var len = 1
      var cont = true
      while (cont && len <= n - p + 1) {
        node = trie.step(node, cps(p + len - 2))
        if (node < 0) cont = false
        else {
          val c = trie.cost(node)
          if (c >= 0L && best(p + len) >= 0L && c + best(p + len) == bp)
            chosen = len
          len += 1
        }
      }
      if (chosen < 0) // cannot happen: best(p) >= 0 certifies a candidate
        throw new IllegalStateException(
          s"unigram viterbi: no optimum-achieving candidate at position $p")
      pieces += UTF8String.fromString(
        s.substring(off(p - 1), off(p - 1 + chosen)))
      p += chosen
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(pieces.toArray[Any]),
      best(1) / 1024L,
      best(1) % 1024L))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbiExpr", this)
    val in  = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${in.code}
        |org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        |if (!${in.isNull}) {
        |  ${ev.value} = $ref.compute(${in.value});
        |}
        |boolean ${ev.isNull} = ${ev.value} == null;
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_unigram_viterbi"
}

object UnigramViterbi {

  /** Codepoint trie over the vocabulary with the packed cost at each
    * terminal node (-1 elsewhere). Built once per executor
    * (`@transient lazy` in the expression); probe depth is naturally
    * bounded by the longest gram, so the DP never scans past it.
    */
  final class Trie(vocab: Seq[(String, Long)]) extends Serializable {
    private val children = mutable.ArrayBuffer(mutable.Map.empty[Int, Int])
    private val costs = mutable.ArrayBuffer(-1L)

    vocab.foreach { case (g, c) =>
      var s = 0
      var i = 0
      while (i < g.length) {
        val cp = g.codePointAt(i)
        s = children(s).getOrElseUpdate(cp, {
          children += mutable.Map.empty[Int, Int]
          costs += -1L
          children.size - 1
        })
        i += Character.charCount(cp)
      }
      costs(s) = c
    }

    /** Child of `node` along codepoint `cp`, or -1. */
    def step(node: Int, cp: Int): Int = children(node).getOrElse(cp, -1)

    /** Packed cost if `node` is terminal, else -1. */
    def cost(node: Int): Long = costs(node)
  }
}
