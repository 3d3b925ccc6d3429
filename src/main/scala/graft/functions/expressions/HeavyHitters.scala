package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow.{apply => row}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a Catalyst
  * `TypedImperativeAggregate` — the one-pass, mergeable way to get
  * dominant keys (vocabulary terms, hot appids) from 100 TB without a
  * full groupBy shuffle of every distinct key.
  *
  * Buffer: at most `k` counters. Seeing an untracked item with the buffer
  * full decrements every counter (dropping zeros) instead of inserting.
  * Guarantees: every item with true frequency > n/(k+1) is present at
  * eval; reported counts are undercounts by at most n/(k+1). With
  * k ≥ |distinct items| no decrement ever fires and counts are EXACT —
  * which is what makes the catalog query oracle-able against a plain
  * GROUP BY.
  *
  * Merge (partial aggregation across partitions) sums counters item-wise,
  * then restores the size bound by subtracting the (k+1)-largest count
  * from all and dropping non-positives (Agarwal et al., "Mergeable
  * Summaries", PODS'12).
  *
  * eval returns array<struct<item string, cnt long>> sorted (cnt desc,
  * item asc) — deterministic regardless of hash-map iteration order.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0, "heavy_hitters capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def add(
      buf: java.util.HashMap[String, Long], item: String, w: Long): Unit = {
    val cur = buf.get(item) // 0L when absent (unboxed null)
    if (buf.containsKey(item)) buf.put(item, cur + w)
    else if (buf.size < k) buf.put(item, w)
    else {
      // decrement-all by the largest amount that keeps every counter >= 0
      var dec = w
      val it0 = buf.values().iterator()
      while (it0.hasNext) dec = math.min(dec, it0.next())
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - dec
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
      val rest = w - dec
      if (rest > 0 && buf.size < k) buf.put(item, rest)
    }
  }

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = if (buf.containsKey(e.getKey)) buf.get(e.getKey) else 0L
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-largest count, drop non-positive
      val counts = new Array[Long](buf.size)
      var i = 0
      val vi = buf.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1) // (k+1)-th largest
      val ei = buf.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0) ei.remove() else e.setValue(nv)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      row(UTF8String.fromString(item), cnt)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val key = in.readUTF()
      buf.put(key, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_heavy_hitters"
}
