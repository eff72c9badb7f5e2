package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a native Catalyst aggregate
  * (Metwally et al. 2005; merge rule per Agarwal et al., "Mergeable
  * Summaries").
  *
  * The exact top-k (groupBy.count + orderBy.limit) shuffles one row per
  * DISTINCT key; at 100 TB with a high-cardinality key that shuffle is
  * the bottleneck. This sketch keeps `capacity` counters per partition
  * and merges them pairwise — shuffle volume is O(capacity × partitions)
  * regardless of key cardinality, with the classic guarantees:
  * estimate ≥ true count, and estimate − true ≤ N / capacity.
  *
  * Implemented as a `TypedImperativeAggregate` (the Catalyst class for
  * arbitrary-state aggregates): per-partition update, binary serialize
  * for the partial-aggregate shuffle, buffer merge, final eval to
  * `array<struct<item, est>>` sorted by (est desc, item).
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def prettyName: String = "graft_topk_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column (cast first), got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) SpaceSavingUtil.add(b, v.toString, 1L, capacity)
    b
  }

  override def merge(b: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, cnt) => SpaceSavingUtil.add(b, item, cnt, capacity) }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any = {
    new GenericArrayData(SpaceSavingUtil.top(b, k).map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.toArray[Any])
  }

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] =
    SpaceSavingUtil.ser(b)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    SpaceSavingUtil.deser(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {
  /** Aggregate Column: approximate top-k heavy hitters of a string column. */
  def topkSketch(c: Column, k: Int, capacity: Int): Column =
    Bridge.column(
      SpaceSavingTopK(Bridge.expression(c), k, capacity).toAggregateExpression())
}

/** The SpaceSaving kernel, shared by the batch aggregate above and the
  * streaming top-k processor (`StreamOps.topkPerKey`) — one definition
  * so the eviction rule and wire format can never drift between the
  * batch and streaming forms. */
object SpaceSavingUtil {
  def add(b: mutable.HashMap[String, Long], item: String, n: Long,
          capacity: Int): Unit =
    b.get(item) match {
      case Some(c) => b.update(item, c + n)
      case None if b.size < capacity => b.update(item, n)
      case None =>
        // evict the minimum counter; the newcomer inherits its count
        // (the SpaceSaving overestimate that keeps est >= true).
        // Plain linear scan without tuple allocation — fine at the
        // capacities used here; a production structure would keep the
        // stream-summary bucket list for O(1) amortized eviction.
        var minItem: String = null
        var minCnt = Long.MaxValue
        b.foreach { case (i, c) =>
          if (c < minCnt || (c == minCnt && (minItem == null || i < minItem))) {
            minItem = i; minCnt = c
          }
        }
        b.remove(minItem)
        b.update(item, minCnt + n)
    }

  /** Top-k by (est desc, item) — total order, deterministic. */
  def top(b: mutable.HashMap[String, Long], k: Int): Seq[(String, Long)] =
    b.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)

  def ser(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (i, c) =>
      // length-prefixed raw UTF-8, not writeUTF (whose modified-UTF-8
      // form caps items at 64KB — too small for a general text key)
      val bytes = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val raw = new Array[Byte](len)
      in.readFully(raw)
      b.update(new String(raw, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    b
  }
}
