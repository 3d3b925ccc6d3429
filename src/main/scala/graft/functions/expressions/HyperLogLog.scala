package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog (Flajolet et al. AofA'07) as a Catalyst
  * `TypedImperativeAggregate` — the industry-standard distinct-count
  * sketch: `m = 2^p` one-byte registers answer "how many DISTINCT keys
  * occurred?" with ~1.04/sqrt(m) relative error from a buffer whose
  * size is independent of the distinct-key count. The catalog's KMV
  * sketch ([[graft.Queries]] `q_kmv_distinct`) answers the same
  * question with a K-sized value list that supports set operations;
  * HLL is the smaller, constant-size register form — the one every
  * warehouse exposes as `approx_count_distinct`. At 100 TB the scale
  * story is the same as [[CountMin]]'s: partials merge by element-wise
  * MAX, so the whole aggregation is one map-side pass plus an m-long
  * array combine per partition — the distinct-key set itself never
  * shuffles (contrast `count(distinct x)`, which shuffles every
  * distinct key).
  *
  * The hash chain is engine-independent so a SQL oracle can rebuild
  * the EXACT register array: for key x,
  *   base = int64(first 15 md5 hex chars of "hl:" ++ x)  (60 bits)
  *   register j = base mod m
  *   w = base div m                                       (60-p bits)
  *   rank = (60-p+1) - bitlength(w), w = 0 -> 60-p+1
  * and register j holds the max rank routed to it. Registers are
  * order- and partition-independent by construction (max is
  * commutative), so the result is deterministic under any
  * partitioning.
  *
  * eval returns the register array as array<int> of length m; the
  * estimator is then plain column algebra over the array — see
  * [[HyperLogLog.estimate]]. The raw-regime estimator is kept
  * float-free: the harmonic sum S = sum_j 2^(Q - M_j) (Q = 60-p) is
  * exact int64 (each term <= 2^Q, m terms), and
  *   E = alpha_ppm * m^2 * 2^Q div (S * 10^6)
  * is one DECIMAL(38,0) integral division — bit-identical in Spark
  * (IntegralDivide) and DuckDB (HUGEINT `//`). The small-range
  * (linear-counting) branch needs ln(m/V); rather than put a float in
  * the hash-compared output, [[HyperLogLog.zeroRegisters]] exposes V
  * and the caller owns the branch — the catalog query runs the sketch
  * in its raw regime (n > 5m/2).
  */
case class HyperLogLog(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 12, "hyperloglog precision p must be in [4,12]")

  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll requires a string-typed key column, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val base = HyperLogLog.baseHash(v.asInstanceOf[UTF8String].toString)
      val j = (base % m).toInt
      val w = base / m
      val rank = HyperLogLog.rankOf(w, 60 - p)
      if (rank > buf(j)) buf(j) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(b => (b.toInt): Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(m)
    val out = new DataOutputStream(bos)
    out.write(buf, 0, m)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Byte](m)
    in.readFully(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll"
}

object HyperLogLog {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private val Prefix: Array[Byte] = "hl:".getBytes("UTF-8")

  /** alpha_m in parts-per-million for m = 256 (p = 8): the standard
    * 0.7213/(1 + 1.079/m) bias constant, FLOORED once here so both
    * engines share the identical integer — the constant, not the float
    * formula, is the contract.
    */
  val Alpha256Ppm: Long = 718272L

  /** JVM side of the shared base hash — identical to the SQL
    * `CAST('0x' || substr(md5('hl:' || x), 1, 15) AS BIGINT)` (60 bits,
    * no modulus: register index and rank bits both come out of it).
    */
  def baseHash(item: String): Long =
    MinHashFamily.hash60(SimHash.digest.get(), Prefix, item)

  /** rank = leading zeros of the q-bit word w, plus 1; w = 0 -> q+1. */
  def rankOf(w: Long, q: Int): Int =
    if (w == 0L) q + 1
    else q + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))

  /** SQL fragment (valid in BOTH Spark SQL and DuckDB) for the exact
    * harmonic sum S = sum_j 2^(q - M_j) over the register array column
    * `regsCol` (q = 60 - p rank bits). Each term is an int64 shift; the
    * astronomically-rare M_j = q+1 register (a zero rank word, prob
    * 2^-q per key) would need the non-integer term 2^-1 — both engines
    * floor it to 0 via the same CASE, keeping the sum exact int64.
    * Spark evaluates `aggregate` HOFs on the JVM and DuckDB `list_...`
    * differs in name, so the Spark side uses this via `expr` and the
    * oracle rebuilds S from its register TABLE with a plain group-by —
    * identical arithmetic either way.
    */
  def sqlHarmonicTerm(rankExpr: String, p: Int): String = {
    val q = 60 - p
    s"(CASE WHEN ($rankExpr) > $q THEN CAST(0 AS BIGINT) " +
      s"ELSE CAST(1 AS BIGINT) << CAST($q - ($rankExpr) AS INT) END)"
  }

  /** Spark-side raw-regime estimate over the eval'd register array
    * column (p = 8 only — the alpha constant is baked): one
    * fold for S, then E = alpha_ppm * m^2 * 2^q div (S * 10^6) as a
    * DECIMAL(38,0) integral division (`div` = IntegralDivide —
    * truncating, exact; numerator ~2.1e26 needs the wide decimal).
    * DuckDB mirrors with HUGEINT `//` — see [[sqlEstimate]].
    */
  def estimate(regsColName: String, p: Int): Column = {
    require(p == 8, "estimate() bakes alpha for p = 8")
    val q = 60 - p
    val s = s"aggregate($regsColName, CAST(0 AS BIGINT), " +
      s"(acc, r) -> acc + ${sqlHarmonicTerm("r", p)})"
    // the harmonic sum can reach m * 2^q = 2^60, so S * 10^6 must
    // widen to decimal BEFORE the multiply (int64 would overflow)
    expr(s"CAST($Alpha256Ppm AS DECIMAL(38,0)) * 65536 * ${1L << q} " +
      s"div (CAST(($s) AS DECIMAL(38,0)) * 1000000)")
  }

  /** DuckDB-side estimate from a per-group harmonic sum expression
    * `sExpr` (built by summing [[sqlHarmonicTerm]] over the rebuilt
    * register table). HUGEINT `//` truncates like Spark's `div`.
    */
  def sqlEstimate(sExpr: String, p: Int): String = {
    require(p == 8, "sqlEstimate() bakes alpha for p = 8")
    val q = 60 - p
    s"CAST(CAST($Alpha256Ppm AS HUGEINT) * 65536 * ${1L << q} " +
      s"// (CAST(($sExpr) AS HUGEINT) * 1000000) AS BIGINT)"
  }

  /** V = number of zero registers — the observable the small-range
    * (linear counting) branch keys on; exposed rather than folded into
    * a float ln().
    */
  def zeroRegisters(regsColName: String): Column =
    expr(s"aggregate($regsColName, CAST(0 AS BIGINT), " +
      "(acc, r) -> acc + CASE WHEN r = 0 THEN 1 ELSE 0 END)")

  /** SQL-oracle fragments of the same chain (DuckDB dialect). */
  def sqlBase(keyExpr: String): String =
    s"CAST('0x' || substr(md5('hl:' || ($keyExpr)), 1, 15) AS BIGINT)"

  /** register index and rank for p; mirrors [[update]] exactly. */
  def sqlRegister(baseExpr: String, p: Int): String =
    s"(($baseExpr) % ${1 << p})"

  def sqlRank(baseExpr: String, p: Int): String = {
    val q = 60 - p
    s"""(CASE WHEN ($baseExpr) // ${1 << p} = 0 THEN ${q + 1}
       | ELSE ${q + 1} - length(bin(($baseExpr) // ${1 << p})) END)""".stripMargin
  }
}
