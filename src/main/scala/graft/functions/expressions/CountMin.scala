package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) as a Catalyst
  * `TypedImperativeAggregate` — the fixed-size, mergeable frequency
  * table: `depth × width` counters answer "how often did key x occur?"
  * with one-sided error (estimates only ever OVERcount, by at most
  * 2n/width with probability 1 − 2^−depth) from a buffer whose size is
  * independent of the number of distinct keys. At 100 TB this is the
  * structure that gives per-key frequencies without shuffling the full
  * distinct-key set: partials merge by element-wise addition, so the
  * whole aggregation is one map-side pass plus a `depth·width`-long
  * array combine.
  *
  * The hash family is engine-independent so a SQL oracle can rebuild
  * the EXACT counter matrix: row i of the sketch buckets key x at
  *   base = int64(first 15 md5 hex chars of "c:" ++ x) mod P
  *   bucket_i = ((A(i)·base + B(i)) mod P) mod width
  * with P, A, B of [[MinHashFamily]] (all intermediates < 2^62 — exact
  * int64 everywhere). Counter values are sums of per-key counts, so
  * addition order never matters and the result is deterministic under
  * any partitioning.
  *
  * eval returns the flattened counter matrix as array<long> of length
  * `depth·width` (row-major: counter(i, b) at index i·width + b);
  * point estimates are then plain column algebra over the array — see
  * [[CountMin.estimate]].
  */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, "count-min depth must be in [1,16]")
  require(width > 1, "count-min width must be > 1")

  override def children: Seq[Expression] = Seq(child)
  // update() casts the child to UTF8String: reject a non-string column at
  // analysis time with a type error, not ClassCastException at execution
  // (ExpectsInputTypes would be idiomatic but AbstractDataType is
  // private[sql]; this hook is the public equivalent)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_count_min requires a string-typed key column, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = CountMin.baseHash(v.asInstanceOf[UTF8String].toString)
      var i = 0
      while (i < depth) {
        val b = ((MinHashFamily.a(i) * base + MinHashFamily.b(i)) % MinHashFamily.P % width).toInt
        buf(i * width + b) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_count_min"
}

object CountMin {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private val Prefix: Array[Byte] = "c:".getBytes("UTF-8")

  /** JVM side of the shared base hash — identical to the SQL
    * `CAST('0x' || substr(md5('c:' || x), 1, 15) AS BIGINT) % P`.
    */
  def baseHash(item: String): Long =
    MinHashFamily.hash60(SimHash.digest.get(), Prefix, item) % MinHashFamily.P

  /** Point estimate from the eval'd counter array: min over rows of the
    * key's bucket — pure column algebra (codegen'd), usable after a
    * broadcast of the one-row sketch. `keyCol` must be the raw key
    * string; the hash chain mirrors [[CountMin.update]] exactly.
    */
  def estimate(sketch: Column, keyCol: Column, depth: Int, width: Int): Column = {
    val base = conv(substring(md5(concat(lit("c:"), keyCol)), 1, 15), 16, 10)
      .cast("long") % MinHashFamily.P
    val probes = (0 until depth).map { i =>
      val b = (lit(MinHashFamily.a(i)) * base + lit(MinHashFamily.b(i))) %
        MinHashFamily.P % width
      element_at(sketch, (lit(i * width) + b + 1).cast("int"))
    }
    if (probes.size == 1) probes.head else least(probes: _*)
  }

  /** SQL-oracle fragments of the same chain (DuckDB dialect). */
  def sqlBase(keyExpr: String): String =
    s"(CAST('0x' || substr(md5('c:' || ($keyExpr)), 1, 15) AS BIGINT) % ${MinHashFamily.P})"

  def sqlBucket(baseExpr: String, i: Int, width: Int): String =
    s"(((${MinHashFamily.a(i)} * $baseExpr + ${MinHashFamily.b(i)}) % ${MinHashFamily.P}) % $width)"
}
