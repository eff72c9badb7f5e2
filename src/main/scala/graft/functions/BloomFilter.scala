package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bloom-filter runtime join pruning — the manual form of the "runtime
  * filter" every warehouse engine applies to star joins: build a compact
  * bitset over the (filtered) dimension keys, broadcast it, and drop
  * fact rows that cannot possibly join BEFORE the join shuffle. At
  * 100 TB the win is shuffle volume: a selective dim predicate turns a
  * full fact shuffle into a shuffle of just the matching fraction
  * (+ the fpp-bounded false positives), for 16 KB of broadcast state.
  *
  * Layout: 4-byte big-endian k (probe count) header, then the bitset.
  * Probes are double hashing h1 + i·h2 over the two xxhash64 seeds —
  * the standard Kirsch–Mitzenmacher construction, deterministic across
  * partitions/engines for a fixed (m, k).
  */
object BloomUtil {
  private val Seed1 = 0L
  private val Seed2 = 0x9E3779B97F4A7C15L

  def emptyBlob(numBits: Int, numHashes: Int): Array[Byte] = {
    require(numBits > 0 && numBits % 8 == 0, "numBits must be a positive multiple of 8")
    require(numHashes > 0, "numHashes must be positive")
    val blob = new Array[Byte](4 + numBits / 8)
    blob(0) = (numHashes >>> 24).toByte
    blob(1) = (numHashes >>> 16).toByte
    blob(2) = (numHashes >>> 8).toByte
    blob(3) = numHashes.toByte
    blob
  }

  private def readK(blob: Array[Byte]): Int =
    ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)

  def setBits(blob: Array[Byte], value: Long): Unit = {
    val k = readK(blob)
    val nBits = (blob.length - 4).toLong * 8L
    val h1 = XXH64.hashLong(value, Seed1)
    val h2 = XXH64.hashLong(value, Seed2)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, nBits)
      val byteIdx = 4 + (bit >>> 3).toInt
      blob(byteIdx) = (blob(byteIdx) | (1 << (bit & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Codegen-callable probe (static forwarder): false ⇒ definitely not
    * a member; true ⇒ member or fpp-bounded false positive. */
  def contains(blob: Array[Byte], value: Long): Boolean = {
    val k = readK(blob)
    val nBits = (blob.length - 4).toLong * 8L
    val h1 = XXH64.hashLong(value, Seed1)
    val h2 = XXH64.hashLong(value, Seed2)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, nBits)
      if ((blob(4 + (bit >>> 3).toInt) & (1 << (bit & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom-filter build over a BIGINT key column: per-partition
  * bitsets OR-merge (order-independent, exact union semantics), so the
  * partial-aggregate shuffle carries m/8 bytes per partition regardless
  * of key cardinality. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def prettyName: String = "graft_bloom_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key column (cast first), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] =
    BloomUtil.emptyBlob(numBits, numHashes)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.setBits(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 4
    while (i < b.length) { b(i) = (b(i) | other(i)).toByte; i += 1 }
    b
  }

  override def eval(b: Array[Byte]): Any = b.clone()
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

/** Scalar membership probe — codegen'd to a single static call so the
  * pruning filter stays inside WholeStageCodegen on the fact scan. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY blob, BIGINT key), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(blob: Any, v: Any): Any =
    BloomUtil.contains(blob.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.BloomUtil.contains($b, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFilter {
  /** Aggregate Column: Bloom bitset over a BIGINT key column. */
  def bloomAgg(c: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(
      BloomBuildAgg(Bridge.expression(c), numBits, numHashes).toAggregateExpression())

  /** Scalar Column: membership probe against a built blob. */
  def bloomContains(blob: Column, key: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(blob), Bridge.expression(key)))
}
