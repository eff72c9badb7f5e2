package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** EXACT distinct counting over integer keys via mergeable bitmap
  * containers — the ClickHouse `groupBitmap` / Roaring-bitmap pattern,
  * and the exact sibling of the HLL sketch family (`a_agg_hll_partial`):
  * per-partition bitmaps OR-merge losslessly, so pre-aggregated daily
  * partials can roll up to per-group totals with NO estimation error —
  * the answer is bit-for-bit the same as a direct `COUNT(DISTINCT)`.
  *
  * Layout: two-level, Roaring-style — key's high 48 bits pick a
  * container, the low 16 bits land in it as either a SORTED short
  * array (≤4096 entries: ~2 bytes/key in memory AND on the wire) or a
  * dense 2^16-bit word array (8 KB, adopted exactly when the sorted
  * array would exceed it). Dense ids cluster into few dense
  * containers; scattered key domains (hashed / snowflake ids — one
  * key per container) stay sparse, so in-memory cost is O(keys), not
  * 8 KB per distinct prefix. Shuffle volume is O(distinct keys / 8)
  * bytes at worst — 8× better than shuffling raw distinct rows, and
  * unlike HLL it is exact at any cardinality.
  *
  * Three surfaces mirror the DataSketches HLL triple:
  * `bitmapAgg` (build: keys → blob), `bitmapUnionAgg` (rollup:
  * blobs → blob), `bitmapCount` (read: blob → BIGINT), all SQL-exposed
  * via [[GraftExtensions]] as `graft_bitmap_agg` /
  * `graft_bitmap_union_agg` / `graft_bitmap_count`.
  */
object BitmapUtil {
  /** A sparse container past this many entries (= the 8 KB dense size)
    * converts to dense — Roaring's exact threshold. */
  val SparseMax = 4096

  sealed trait Container
  /** Sorted unique low-16 values in `vals(0 until n)` (Char = u16). */
  final class Sparse(var vals: Array[Char], var n: Int) extends Container
  /** 2^16-bit word array. */
  final class Dense(val words: Array[Long]) extends Container

  /** high-48-bits → sparse-or-dense low-16 container. */
  type BM = mutable.LongMap[Container]

  def empty: BM = mutable.LongMap.empty[Container]

  private def setBit(words: Array[Long], low: Int): Unit =
    words(low >>> 6) |= 1L << (low & 63)

  private def toDense(s: Sparse): Dense = {
    val d = new Dense(new Array[Long](1024))
    var i = 0
    while (i < s.n) { setBit(d.words, s.vals(i).toInt); i += 1 }
    d
  }

  def add(bm: BM, v: Long): Unit = {
    val high = v >>> 16
    val low = (v & 0xffffL).toInt
    bm.get(high) match {
      case None =>
        val s = new Sparse(new Array[Char](4), 1)
        s.vals(0) = low.toChar
        bm.update(high, s)
      case Some(d: Dense) => setBit(d.words, low)
      case Some(s: Sparse) =>
        val idx = java.util.Arrays.binarySearch(s.vals, 0, s.n, low.toChar)
        if (idx < 0) {
          if (s.n == SparseMax) {
            val d = toDense(s)
            setBit(d.words, low)
            bm.update(high, d)
          } else {
            val ins = -idx - 1
            if (s.n == s.vals.length)
              s.vals = java.util.Arrays.copyOf(s.vals, s.vals.length * 2)
            System.arraycopy(s.vals, ins, s.vals, ins + 1, s.n - ins)
            s.vals(ins) = low.toChar
            s.n += 1
          }
        }
    }
  }

  /** Union of two sorted unique char runs; densifies past SparseMax. */
  private def mergeSparse(a: Sparse, b: Sparse): Container = {
    val out = new Array[Char](math.min(a.n + b.n, SparseMax + 1))
    var (i, j, k) = (0, 0, 0)
    var pending = -1 // the element that didn't fit, if any
    while (pending < 0 && (i < a.n || j < b.n)) {
      val c =
        if (j >= b.n || (i < a.n && a.vals(i) <= b.vals(j))) {
          val c0 = a.vals(i); if (j < b.n && b.vals(j) == c0) j += 1; i += 1; c0
        } else { val c0 = b.vals(j); j += 1; c0 }
      if (k == SparseMax) pending = c.toInt else { out(k) = c; k += 1 }
    }
    if (pending < 0) new Sparse(out, k)
    else {
      val d = toDense(new Sparse(out, k))
      setBit(d.words, pending)
      while (i < a.n) { setBit(d.words, a.vals(i).toInt); i += 1 }
      while (j < b.n) { setBit(d.words, b.vals(j).toInt); j += 1 }
      d
    }
  }

  /** OR-merge `other` into `into` (exact set union, order-independent).
    * `other`'s containers are copied, never aliased — the caller may
    * discard or keep mutating its buffer. */
  def or(into: BM, other: BM): Unit =
    other.foreach { case (high, c) =>
      into.get(high) match {
        case None =>
          c match {
            case s: Sparse =>
              into.update(high, new Sparse(java.util.Arrays.copyOf(s.vals, s.n), s.n))
            case d: Dense => into.update(high, new Dense(d.words.clone()))
          }
        case Some(mine: Dense) =>
          c match {
            case s: Sparse =>
              var i = 0
              while (i < s.n) { setBit(mine.words, s.vals(i).toInt); i += 1 }
            case d: Dense =>
              var i = 0
              while (i < 1024) { mine.words(i) |= d.words(i); i += 1 }
          }
        case Some(mine: Sparse) =>
          c match {
            case s: Sparse => into.update(high, mergeSparse(mine, s))
            case d: Dense =>
              val nd = new Dense(d.words.clone())
              var i = 0
              while (i < mine.n) { setBit(nd.words, mine.vals(i).toInt); i += 1 }
              into.update(high, nd)
          }
      }
    }

  def count(bm: BM): Long = {
    var n = 0L
    bm.foreach {
      case (_, s: Sparse) => n += s.n
      case (_, d: Dense) =>
        var i = 0
        while (i < 1024) { n += java.lang.Long.bitCount(d.words(i)); i += 1 }
    }
    n
  }

  /** Deterministic encoding: containers sorted by high key (always
    * non-negative — `v >>> 16`); per container a tag byte then either
    * the sorted shorts (sparse) or the non-zero (index, word) pairs
    * (dense). A scattered key costs ~2 bytes on the wire. */
  def ser(bm: BM): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val highs = bm.keys.toArray
    java.util.Arrays.sort(highs)
    out.writeInt(highs.length)
    highs.foreach { high =>
      out.writeLong(high)
      bm(high) match {
        case s: Sparse =>
          out.writeByte(0)
          out.writeInt(s.n)
          var i = 0
          while (i < s.n) { out.writeChar(s.vals(i).toInt); i += 1 }
        case d: Dense =>
          out.writeByte(1)
          var nz = 0
          var i = 0
          while (i < 1024) { if (d.words(i) != 0L) nz += 1; i += 1 }
          out.writeInt(nz)
          i = 0
          while (i < 1024) {
            if (d.words(i) != 0L) { out.writeShort(i); out.writeLong(d.words(i)) }
            i += 1
          }
      }
    }
    out.flush()
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): BM = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bm = empty
    val nContainers = in.readInt()
    var c = 0
    while (c < nContainers) {
      val high = in.readLong()
      val container: Container = in.readByte() match {
        case 0 =>
          val n = in.readInt()
          val vals = new Array[Char](n)
          var i = 0
          while (i < n) { vals(i) = in.readChar(); i += 1 }
          new Sparse(vals, n)
        case _ =>
          val nz = in.readInt()
          val ws = new Array[Long](1024)
          var i = 0
          while (i < nz) { ws(in.readShort().toInt) = in.readLong(); i += 1 }
          new Dense(ws)
      }
      bm.update(high, container)
      c += 1
    }
    bm
  }

  /** Codegen-callable static count over a serialized blob. */
  def countBlob(bytes: Array[Byte]): Long = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    var n = 0L
    val nContainers = in.readInt()
    var c = 0
    while (c < nContainers) {
      in.readLong()
      in.readByte() match {
        case 0 =>
          val k = in.readInt()
          n += k
          in.skipBytes(2 * k)
        case _ =>
          val nz = in.readInt()
          var i = 0
          while (i < nz) { in.readShort(); n += java.lang.Long.bitCount(in.readLong()); i += 1 }
      }
      c += 1
    }
    n
  }
}

private[functions] trait BitmapAggBase extends TypedImperativeAggregate[BitmapUtil.BM] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): BitmapUtil.BM = BitmapUtil.empty
  override def merge(b: BitmapUtil.BM, other: BitmapUtil.BM): BitmapUtil.BM = {
    BitmapUtil.or(b, other); b
  }
  override def eval(b: BitmapUtil.BM): Any = BitmapUtil.ser(b)
  override def serialize(b: BitmapUtil.BM): Array[Byte] = BitmapUtil.ser(b)
  override def deserialize(bytes: Array[Byte]): BitmapUtil.BM = BitmapUtil.deser(bytes)
}

/** Build: BIGINT keys → serialized bitmap blob. */
case class BitmapBuildAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapAggBase {

  override def prettyName: String = "graft_bitmap_agg"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key column (cast first), got ${child.dataType.sql}")

  override def update(b: BitmapUtil.BM, input: InternalRow): BitmapUtil.BM = {
    val v = child.eval(input)
    if (v != null) BitmapUtil.add(b, v.asInstanceOf[Long])
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapBuildAgg =
    copy(child = newChildren.head)
}

/** Rollup: serialized blobs → their exact union blob (the lossless
  * re-aggregation step `q_agg_reagg` proves for sums, now for sets). */
case class BitmapUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapAggBase {

  override def prettyName: String = "graft_bitmap_union_agg"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY bitmap blob, got ${child.dataType.sql}")

  override def update(b: BitmapUtil.BM, input: InternalRow): BitmapUtil.BM = {
    val v = child.eval(input)
    if (v != null) BitmapUtil.or(b, BitmapUtil.deser(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapUnionAgg =
    copy(child = newChildren.head)
}

/** Read: blob → exact distinct count, codegen'd to one static call. */
case class BitmapCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_bitmap_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY bitmap blob, got ${child.dataType.sql}")

  override protected def nullSafeEval(blob: Any): Any =
    BitmapUtil.countBlob(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.BitmapUtil.countBlob($b)")

  override protected def withNewChildInternal(newChild: Expression): BitmapCount =
    copy(child = newChild)
}

object Bitmap {
  def bitmapAgg(c: Column): Column =
    Bridge.column(BitmapBuildAgg(Bridge.expression(c)).toAggregateExpression())
  def bitmapUnionAgg(c: Column): Column =
    Bridge.column(BitmapUnionAgg(Bridge.expression(c)).toAggregateExpression())
  def bitmapCount(c: Column): Column =
    Bridge.column(BitmapCount(Bridge.expression(c)))
}
