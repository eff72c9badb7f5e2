package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** MERGEABLE quantile sketch — percentiles as a pre-aggregation
  * citizen, completing the sketch family (HLL for distincts, CMS for
  * frequencies, SpaceSaving for top-k, Bloom for membership, bitmap
  * for exact sets — and now Greenwald–Khanna summaries for ranks).
  * The single most common tsdb dashboard rollup: per-(type, day)
  * partials materialized ONCE by the big job, then any slice's p50/p95
  * /p99 answered by merging a handful of constant-size blobs — raw
  * rows are never re-scanned, and the merge is associative/commutative
  * so any partitioning works.
  *
  * Built on Spark's own `QuantileSummaries` (the engine behind
  * `approxQuantile`/`percentile_approx`): insert-time GK summary with
  * relative rank error ε, so a queried quantile φ is guaranteed to sit
  * within rank [(φ−ε)·N, (φ+ε)·N] — the bound PropertySpec enforces.
  * Spark's built-in `percentile_approx` cannot expose its partial as a
  * value; this aggregate does, exactly like `a_agg_hll_partial`'s
  * sketch column.
  *
  * Three surfaces mirror the bitmap/HLL triple: `quantileAgg` (build:
  * doubles → blob), `quantileMergeAgg` (rollup: blobs → blob),
  * `quantileQuery` (read: blob × φ → estimate), SQL-exposed via
  * [[GraftExtensions]] as `graft_quantile_agg` /
  * `graft_quantile_merge_agg` / `graft_quantile_query`.
  */
object QuantileSketchUtil {
  /** Mutable holder: `QuantileSummaries.insert` is copy-on-write. */
  final class Buf(var qs: QuantileSummaries)

  def empty(relErr: Double): Buf =
    new Buf(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relErr,
      Array.empty[QuantileSummaries.Stats], 0L, false))

  /** Deterministic encoding: (relErr, compressThreshold, count, then
    * the compressed sample array as (value, g, delta) triples). */
  def ser(b: Buf): Array[Byte] = {
    b.qs = b.qs.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(b.qs.relativeError)
    out.writeInt(b.qs.compressThreshold)
    out.writeLong(b.qs.count)
    val samples = b.qs.sampled
    out.writeInt(samples.length)
    samples.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val relErr = in.readDouble()
    val threshold = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val samples = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      samples(i) = new QuantileSummaries.Stats(
        in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    new Buf(new QuantileSummaries(threshold, relErr, samples, count, true))
  }

  /** Codegen-callable static query over a serialized blob. Returns
    * NaN on an empty sketch (mapped to NULL by the expression). */
  def queryBlob(bytes: Array[Byte], phi: Double): Double =
    deser(bytes).qs.query(phi) match {
      case Some(v) => v
      case None => Double.NaN
    }
}

private[functions] trait QuantileAggBase
    extends TypedImperativeAggregate[QuantileSketchUtil.Buf] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def merge(b: QuantileSketchUtil.Buf,
                     other: QuantileSketchUtil.Buf): QuantileSketchUtil.Buf = {
    b.qs = b.qs.compress()
    other.qs = other.qs.compress()
    // GK merge of an empty summary is undefined in Spark's impl — an
    // empty side contributes nothing, keep the other
    if (other.qs.count == 0L) b
    else if (b.qs.count == 0L) { b.qs = other.qs; b }
    else { b.qs = b.qs.merge(other.qs); b }
  }
  override def eval(b: QuantileSketchUtil.Buf): Any = QuantileSketchUtil.ser(b)
  override def serialize(b: QuantileSketchUtil.Buf): Array[Byte] =
    QuantileSketchUtil.ser(b)
  override def deserialize(bytes: Array[Byte]): QuantileSketchUtil.Buf =
    QuantileSketchUtil.deser(bytes)
}

/** Build: DOUBLE values → serialized GK summary blob with relative
  * rank error `relErr`. */
case class QuantileBuildAgg(
    child: Expression,
    relErr: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends QuantileAggBase {

  override def prettyName: String = "graft_quantile_agg"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE value column (cast first), got ${child.dataType.sql}")

  override def createAggregationBuffer(): QuantileSketchUtil.Buf =
    QuantileSketchUtil.empty(relErr)

  override def update(b: QuantileSketchUtil.Buf,
                      input: InternalRow): QuantileSketchUtil.Buf = {
    val v = child.eval(input)
    if (v != null) b.qs = b.qs.insert(v.asInstanceOf[Double])
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileBuildAgg =
    copy(child = newChildren.head)
}

/** Rollup: serialized GK blobs → their merged blob (rank error stays
  * ≤ the per-partial ε — GK merge is lossless in the guarantee). */
case class QuantileMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends QuantileAggBase {

  override def prettyName: String = "graft_quantile_merge_agg"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY sketch blob, got ${child.dataType.sql}")

  override def createAggregationBuffer(): QuantileSketchUtil.Buf =
    QuantileSketchUtil.empty(QuantileSummaries.defaultRelativeError)

  override def update(b: QuantileSketchUtil.Buf,
                      input: InternalRow): QuantileSketchUtil.Buf = {
    val v = child.eval(input)
    if (v != null)
      merge(b, QuantileSketchUtil.deser(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileMergeAgg =
    copy(child = newChildren.head)
}

/** Read: (blob, φ) → quantile estimate; NULL on an empty sketch.
  * CodegenFallback: runs once per OUTPUT group (post-aggregation), not
  * per input row — interpreted eval costs nothing here. */
case class QuantileQuery(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "graft_quantile_query"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY blob, DOUBLE phi), got " +
      s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(blob: Any, phi: Any): Any = {
    val v = QuantileSketchUtil.queryBlob(
      blob.asInstanceOf[Array[Byte]], phi.asInstanceOf[Double])
    if (v.isNaN) null else v
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileQuery =
    copy(left = newLeft, right = newRight)
}

object QuantileSketch {
  def quantileAgg(c: Column, relErr: Double = 0.01): Column =
    Bridge.column(
      QuantileBuildAgg(Bridge.expression(c), relErr).toAggregateExpression())
  def quantileMergeAgg(c: Column): Column =
    Bridge.column(
      QuantileMergeAgg(Bridge.expression(c)).toAggregateExpression())
  def quantileQuery(c: Column, phi: Column): Column =
    Bridge.column(
      QuantileQuery(Bridge.expression(c), Bridge.expression(phi)))
}
